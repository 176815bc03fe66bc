"""Roofline analysis of the fused env step and the PPO update (VERDICT r2 #6).

Counts FLOPs and HBM bytes from XLA's own cost model
(`compiled.cost_analysis()`) for:
  (a) one fused env control step (ops/pallas_fused.py path, 8192 envs),
  (b) one full PPO update (rollout + GAE + minibatch gradient passes),
  (c) one isolated minibatch gradient pass,
then measures on-device time (chained launches to amortize the ~26 ms
remote-tunnel dispatch — see SCALING.md) and reports achieved FLOP/s and
bytes/s against nominal chip peaks.

Peaks are CONFIGURABLE because jax.devices() reports platform 'axon'
(a tunneled remote chip) without a public spec; the defaults below are
TPU v5e datasheet numbers (197 bf16 TFLOP/s => ~98.5 f32 via MXU passes,
819 GB/s HBM).  The conclusion (compute- vs memory- vs launch-bound)
is driven by the RATIO bytes/flops vs the machine balance, which is
robust to the exact peak chosen.

Writes artifacts/roofline.json and prints a summary.

Usage: python scripts/roofline.py [--platform tpu|cpu] [--num_envs 8192]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PEAK_F32_TFLOPS = 98.5      # v5e MXU f32-via-bf16x3 approx; see docstring
PEAK_HBM_GBS = 819.0        # v5e HBM bandwidth


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="tpu")
    ap.add_argument("--num_envs", type=int, default=8192)
    ap.add_argument("--rollout_steps", type=int, default=64)
    ap.add_argument("--minibatches", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=4)
    args = ap.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gym_pybullet_drones_tpu import params as P
    from gym_pybullet_drones_tpu.envs import AviaryConfig, HoverTask
    from gym_pybullet_drones_tpu.envs.fast import (
        make_batched_step, make_fused_rollout)
    from gym_pybullet_drones_tpu.rl import PPOConfig, make_train
    from gym_pybullet_drones_tpu.utils.enums import ActionType, Physics

    cfg = AviaryConfig(drone=P.CF2X, num_drones=1, physics=Physics.DYN,
                       pyb_freq=240, ctrl_freq=30)
    task = HoverTask(act=ActionType.RPM)
    B, T = args.num_envs, args.rollout_steps
    report = {"platform": jax.devices()[0].platform,
              "device": str(jax.devices()[0]),
              "assumed_peak_f32_tflops": PEAK_F32_TFLOPS,
              "assumed_peak_hbm_gbs": PEAK_HBM_GBS,
              "num_envs": B, "rollout_steps": T}

    # ---- (a) fused env step --------------------------------------------
    try:
        reset_fn, step_fn = make_fused_rollout(cfg, task, B)
    except ValueError:
        reset_fn, step_fn = make_batched_step(cfg, task, B)
    state, obs = reset_fn()
    act = jnp.zeros((B, 1, 4), jnp.float32)

    def chain_steps(state, n):
        def body(c, _):
            s, acc = c
            s, o, r, te, tr = step_fn(s, act)
            return (s, acc + jnp.sum(o)), None
        (s, acc), _ = jax.lax.scan(body, (state, 0.0), None, length=n)
        return s, acc

    # slope fit over two chain lengths: a single launch through the
    # remote-TPU tunnel costs ~26 ms regardless of payload (SCALING.md),
    # so absolute chain times measure the tunnel, not the device
    cs = jax.jit(chain_steps, static_argnums=1)
    times = {}
    for n_chain in (512, 4096):
        comp = cs.lower(state, n_chain).compile()
        st2, acc = comp(state)
        float(acc)
        best_t = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            st2, acc = comp(state)
            float(acc)
            best_t = min(best_t, time.perf_counter() - t0)
        times[n_chain] = best_t
    per_step = (times[4096] - times[512]) / (4096 - 512)
    # NOTE: cost_analysis undercounts Pallas custom-calls (opaque to the
    # XLA cost model) and scan bodies (counted once, not per iteration),
    # so no flops/bytes are reported for the fused env step — only the
    # slope-fitted on-device rate
    report["env_step"] = {
        "wall_s_per_step_slope_fit": per_step,
        "env_steps_per_s": B / per_step,
        "chain_times_s": times,
    }

    # ---- (b) full PPO update -------------------------------------------
    ppo = PPOConfig(num_envs=B, rollout_steps=T,
                    num_minibatches=args.minibatches,
                    update_epochs=args.epochs)
    init, update, _, network = make_train(cfg, task, ppo)
    ts = init(jax.random.key(0))
    um = jax.jit(update.many, static_argnums=1)
    utimes = {}
    for n_upd in (4, 32):
        comp = um.lower(ts, n_upd).compile()
        ts2, m = comp(ts)
        float(m["mean_reward"][-1])
        best_t = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            ts2, m = comp(ts)
            float(m["mean_reward"][-1])
            best_t = min(best_t, time.perf_counter() - t0)
        utimes[n_upd] = best_t
    per_update = (utimes[32] - utimes[4]) / (32 - 4)
    report["ppo_update"] = {
        "wall_s_per_update_slope_fit": per_update,
        "env_steps_per_s": ppo.batch_size / per_update,
        "chain_times_s": utimes,
    }

    # ---- (c) isolated minibatch gradient pass --------------------------
    import numpy as np
    mb = ppo.batch_size // ppo.num_minibatches
    obs_dim = ts.last_obs.shape[-1]
    batch_obs = jnp.zeros((mb, obs_dim), jnp.float32)
    batch_act = jnp.zeros((mb, 1), jnp.float32)
    tgt = jnp.zeros((mb,), jnp.float32)

    def loss_fn(params):
        mean, logstd, value = network.apply(params, batch_obs)
        # representative compute: policy fwd + value fwd + reductions
        lp = -0.5 * jnp.sum(((batch_act - mean) / jnp.exp(logstd)) ** 2,
                            axis=-1)
        return jnp.mean((value - tgt) ** 2) - jnp.mean(lp)

    grad = jax.jit(jax.grad(loss_fn))
    lowered = grad.lower(ts.params)
    comp = lowered.compile()
    flops_g, bytes_g = _cost(comp)
    g = comp(ts.params)
    jax.block_until_ready(g)
    report["minibatch_grad"] = {
        "minibatch_size": mb,
        "flops": flops_g,
        "bytes": bytes_g,
        "arithmetic_intensity": flops_g / max(bytes_g, 1.0),
        "machine_balance_flops_per_byte":
            PEAK_F32_TFLOPS * 1e12 / (PEAK_HBM_GBS * 1e9),
    }

    # roofline model of one update from the (reliable, scan-free)
    # isolated gradient pass + the slope-fitted rollout rate
    passes = args.epochs * args.minibatches
    grad_bytes_update = bytes_g * passes
    grad_flops_update = flops_g * passes
    hbm_floor_s = grad_bytes_update / (PEAK_HBM_GBS * 1e9)
    flops_floor_s = grad_flops_update / (PEAK_F32_TFLOPS * 1e12)
    rollout_s = ppo.rollout_steps * report["env_step"][
        "wall_s_per_step_slope_fit"]
    report["breakdown"] = {
        "grad_passes_per_update": passes,
        "grad_flops_per_update": grad_flops_update,
        "grad_bytes_per_update": grad_bytes_update,
        "update_hbm_floor_s": hbm_floor_s,
        "update_flops_floor_s": flops_floor_s,
        "rollout_s_per_update": rollout_s,
        "bound": "memory" if hbm_floor_s > flops_floor_s else "compute",
        "pct_of_hbm_roofline": 100 * (hbm_floor_s + rollout_s)
            / max(per_update, 1e-12),
    }

    os.makedirs(os.path.join(os.path.dirname(__file__), "..", "artifacts"),
                exist_ok=True)
    out = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                       "roofline.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    print(f"-> {out}")


if __name__ == "__main__":
    main()
