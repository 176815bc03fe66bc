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
# VPU (vector unit) peak, the ceiling for the env kernels (pure
# elementwise math, MXU unused): 4 ALUs x (8, 128) lanes x ~1.5 GHz
# (clock back-derived from the 197 bf16 TFLOP/s MXU datasheet peak:
# 197e12 / (4 MXUs x 128x128 MACs x 2)).  ~6.1 TFLOP/s counting one
# flop/ALU/cycle; FMA-heavy code can reach ~2x this.  ASSUMED like the
# other peaks (platform string is 'axon').
PEAK_F32_VPU_TFLOPS = 6.1


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

    # ---- (a2) fused env-kernel rooflines (VERDICT r3 next #6) ----------
    # The Pallas kernel is opaque to XLA's cost model, but its HBM traffic
    # is EXACT by construction (the carry/action/output rows are read and
    # written once per control step; everything between substeps lives in
    # VMEM), and its algorithmic flops are well-approximated by the XLA
    # cost model of the mathematically-equivalent non-fused program
    # (make_batched_step(use_pallas=False) — kernel-equivalence-tested
    # against the fused path in tests/test_fused.py).
    from gym_pybullet_drones_tpu.envs import make_routing_config
    from gym_pybullet_drones_tpu.ops import pallas_fused

    def _env_kernel_roofline(cfg_k, task_k, B_k, chains=(1024, 4096)):
        n = cfg_k.num_drones
        buf_len, act_dim = task_k.action_buffer_shape(cfg_k)
        buf_rows = buf_len * act_dim
        _, rc = pallas_fused._layout(n, buf_rows, task_k.act)
        n_extra = (task_k.n_extra_obs_rows
                   if getattr(task_k, "row_extra_obs", None) is not None
                   else 0)
        ro = n * (12 + buf_rows + n_extra) + 3
        # carry read + carry write + action read + output write, f32
        bytes_step = (2 * rc + n * act_dim + ro) * 4 * B_k
        # algorithmic flops: cost model of the equivalent XLA-path step
        r_fb, s_fb = make_batched_step(cfg_k, task_k, B_k,
                                       use_pallas=False, obs_layout="flat")
        st_fb, _ = r_fb()
        act_k = jnp.zeros((B_k, n, act_dim), jnp.float32)
        comp_fb = jax.jit(s_fb).lower(st_fb, act_k).compile()
        flops_step, _ = _cost(comp_fb)
        # measured fused-kernel time: slope fit over chained scans with
        # the obs kept live (same honesty rule as bench.py)
        try:
            reset_k, step_k = make_fused_rollout(cfg_k, task_k, B_k)
            measured_path = "fused"
        except ValueError:   # CPU run: time the XLA path instead
            reset_k, step_k = r_fb, s_fb
            measured_path = "xla-fallback"
        st_k, _ = reset_k()

        def chain_k(state, nn):
            def body(c, _):
                s, acc = c
                s, o, r, te, tr = step_k(s, act_k)
                return (s, acc + jnp.sum(o)), None
            (s, acc), _ = jax.lax.scan(body, (state, 0.0), None, length=nn)
            return s, acc

        ck = jax.jit(chain_k, static_argnums=1)
        tk = {}
        for n_chain in chains:
            comp = ck.lower(st_k, n_chain).compile()
            s2, acc = comp(st_k)
            float(acc)
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                s2, acc = comp(st_k)
                float(acc)
                best = min(best, time.perf_counter() - t0)
            tk[n_chain] = best
        per_s = (tk[chains[1]] - tk[chains[0]]) / (chains[1] - chains[0])
        rate = B_k / per_s
        out = {
            # which implementation the timing below actually measured; the
            # exact-HBM-bytes model describes the FUSED kernel, so the
            # roofline percentages are only meaningful when this says
            # 'fused' (ADVICE r4: a CPU-generated artifact must be
            # distinguishable from a TPU one)
            "measured_path": measured_path,
            "num_envs": B_k,
            "carry_rows": rc, "out_rows": ro,
            "hbm_bytes_per_ctrl_step_exact": bytes_step,
            "alg_flops_per_ctrl_step_xla_cost_model": flops_step,
            "flops_per_env_step": flops_step / B_k,
            "measured_s_per_ctrl_step": per_s,
            "env_steps_per_s": rate,
            "achieved_gbs": bytes_step / per_s / 1e9,
            "pct_of_hbm_roofline":
                100 * (bytes_step / per_s) / (PEAK_HBM_GBS * 1e9),
            "achieved_vpu_tflops": flops_step / per_s / 1e12,
            "pct_of_assumed_vpu_peak":
                100 * (flops_step / per_s) / (PEAK_F32_VPU_TFLOPS * 1e12),
            "bound": ("vpu-compute" if
                      (flops_step / (PEAK_F32_VPU_TFLOPS * 1e12))
                      > (bytes_step / (PEAK_HBM_GBS * 1e9))
                      else "hbm"),
        }
        if measured_path != "fused":
            # percentages computed from the fused-kernel byte model do not
            # describe the fallback implementation — drop them
            for k in ("pct_of_hbm_roofline", "pct_of_assumed_vpu_peak",
                      "achieved_gbs", "achieved_vpu_tflops", "bound"):
                out.pop(k)
        return out

    cfg_rt, task_rt = make_routing_config(num_drones=4, spacing=0.5)
    report["env_kernels"] = {
        "hover_dyn_4096": _env_kernel_roofline(
            AviaryConfig(drone=P.CF2X, num_drones=1, physics=Physics.DYN,
                         pyb_freq=240, ctrl_freq=30),
            HoverTask(act=ActionType.RPM), 4096),
        "routing_pyb_4096": _env_kernel_roofline(
            cfg_rt, task_rt, 4096, chains=(64, 256)),
    }
    # adjudicate the 2.5x session-to-session PYB variance (SCALING.md):
    # which historical routing-PYB rate is consistent with the assumed
    # VPU peak?  implied TFLOP/s = alg flops/ctrl-step * rate / num_envs.
    rk = report["env_kernels"]["routing_pyb_4096"]
    fpe = rk["flops_per_env_step"]
    report["env_kernels"]["pyb_session_variance_check"] = {
        "flops_per_env_step": fpe,
        "implied_vpu_tflops_at_77.3M": 77.3e6 * fpe / 1e12,
        "implied_vpu_tflops_at_29M": 29e6 * fpe / 1e12,
        "assumed_vpu_peak_tflops": PEAK_F32_VPU_TFLOPS,
        "note": "a rate whose implied TFLOP/s exceeds the assumed VPU "
                "peak (even the 2x FMA band) cannot be chip-limited "
                "truth for this kernel",
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
