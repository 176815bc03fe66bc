"""Extended benchmark suite: one JSON line per tracked config.

BASELINE.md tracked configs beyond the primary bench.py metric:
multi-drone MultiHover, the routing fleet task, PPO learner throughput, and
(when more than one device is visible) data-mesh scaling efficiency.
All timings force a host readback per iteration (see bench.py).
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu import params as P
from gym_pybullet_drones_tpu.envs import (
    AviaryConfig, HoverTask, MultiHoverTask)
from gym_pybullet_drones_tpu.envs.fast import make_batched_step
from gym_pybullet_drones_tpu.envs.routing import make_routing_config
from gym_pybullet_drones_tpu.rl import PPOConfig, make_train
from gym_pybullet_drones_tpu.utils.enums import ActionType, Physics


def _bench_env(cfg, task, num_envs, chunk=1024, repeats=3, act_dim=4):
    # prefer the fully-fused one-launch step (ops/pallas_fused.py) — the
    # same path rl/ppo.py trains on — and fall back to the batched path
    # for configurations the fused kernel does not cover
    try:
        from gym_pybullet_drones_tpu.envs.fast import make_fused_rollout
        reset_fn, step_fn = make_fused_rollout(cfg, task, num_envs)
    except ValueError:
        reset_fn, step_fn = make_batched_step(cfg, task, num_envs)
    state, obs = reset_fn()

    def one_step(carry, action):
        state, obs, r, te, tr = step_fn(carry, action)
        # keep the obs computation live (see bench.py)
        return state, r + 1e-30 * jnp.sum(obs)

    @jax.jit
    def rollout(state, actions):
        return jax.lax.scan(one_step, state, actions)

    actions = 0.1 * jax.random.normal(
        jax.random.key(0),
        (chunk, num_envs, cfg.num_drones, act_dim), jnp.float32)
    state, rew = rollout(state, actions)
    float(jnp.sum(rew))
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, rew = rollout(state, actions)
        float(jnp.sum(rew))
        best = max(best, num_envs * chunk / (time.perf_counter() - t0))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_ALL_r03.json",
                    help="versioned artifact path (repo root); every "
                         "SCALING.md measurement row must come from this "
                         "file (tests/test_docs_consistency.py)")
    args = ap.parse_args()
    results = []

    # MultiHover: 2-drone multi-agent, 8192 envs (fused-path lanes are
    # envs; small batches leave the kernel row-bound — see SCALING.md)
    cfg = AviaryConfig(drone=P.CF2X, num_drones=2, physics=Physics.DYN,
                       pyb_freq=240, ctrl_freq=30)
    rate = _bench_env(cfg, MultiHoverTask(act=ActionType.RPM), 8192)
    results.append({"metric": "env_steps_per_sec_multihover2x8192",
                    "value": round(rate, 1), "unit": "env-steps/s",
                    "vs_baseline": round(rate / 1e7, 4)})

    # Routing fleet: 4-drone PID-routing, 4096 envs (fused PID+DYN kernel)
    cfg, task = make_routing_config(num_drones=4, physics=Physics.DYN)
    rate = _bench_env(cfg, task, 4096, chunk=1024, act_dim=3)
    results.append({"metric": "env_steps_per_sec_routing4x4096",
                    "value": round(rate, 1), "unit": "env-steps/s",
                    "vs_baseline": round(rate / 1e7, 4)})

    # Routing DEFAULT config: PYB physics + embedded PID + contact, in the
    # fully-fused one-launch kernel (ops/pallas_fused.py)
    cfg, task = make_routing_config(num_drones=4)
    rate = _bench_env(cfg, task, 4096, chunk=1024, act_dim=3)
    results.append({"metric": "env_steps_per_sec_routing4x4096_pyb",
                    "value": round(rate, 1), "unit": "env-steps/s",
                    "vs_baseline": round(rate / 1e7, 4)})

    # All aero effects (ground effect + drag + downwash) fused, PYB mode
    cfg = AviaryConfig(drone=P.CF2X, num_drones=1,
                       physics=Physics.PYB_GND_DRAG_DW, pyb_freq=240,
                       ctrl_freq=30)
    rate = _bench_env(cfg, HoverTask(act=ActionType.RPM), 4096)
    results.append({"metric": "env_steps_per_sec_hover4096_pyb_aero",
                    "value": round(rate, 1), "unit": "env-steps/s",
                    "vs_baseline": round(rate / 1e7, 4)})

    # RGB observations: ray-traced (48, 64, 4) per drone (ops/render.py,
    # reference BaseRLAviary.py:252-306) — the pixel path the reference
    # serves through TinyRenderer, here fully on-device
    from gym_pybullet_drones_tpu.utils.enums import ObservationType
    cfg = AviaryConfig(drone=P.CF2X, num_drones=1, physics=Physics.DYN,
                       pyb_freq=240, ctrl_freq=30)
    rate = _bench_env(cfg, HoverTask(act=ActionType.RPM,
                                     obs=ObservationType.RGB),
                      256, chunk=64)
    results.append({"metric": "env_steps_per_sec_hover256_rgb",
                    "value": round(rate, 1), "unit": "env-steps/s",
                    "vs_baseline": round(rate / 1e7, 4)})

    # PPO learner throughput: env-steps consumed per second of training
    cfg = AviaryConfig(drone=P.CF2X, num_drones=1, physics=Physics.DYN,
                       pyb_freq=240, ctrl_freq=30)
    ppo = PPOConfig(num_envs=8192, rollout_steps=64, num_minibatches=4,
                    update_epochs=4)
    init, update, _, _ = make_train(cfg, HoverTask(act=ActionType.RPM), ppo)
    ts = init(jax.random.key(0))
    # chunked training: 32 updates per launch (update.many) so the remote
    # dispatch cost (~26 ms/launch through the tunnel, measured vs a
    # trivial jitted readback) is amortized exactly as a real training
    # loop would; per-update on-device compute is ~13 ms at 8192 envs
    n_chain = 32
    upd = jax.jit(update.many, static_argnums=1)
    ts, m = upd(ts, n_chain)
    float(m["mean_reward"][-1])
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        ts, m = upd(ts, n_chain)
        float(m["mean_reward"][-1])
        best = max(best, n_chain * ppo.batch_size
                   / (time.perf_counter() - t0))
    results.append({"metric": "ppo_env_steps_per_sec_hover8192",
                    "value": round(best, 1), "unit": "env-steps/s",
                    "vs_baseline": round(best / 1e7, 4)})

    # Population-parallel PPO (rl/population.py): K=8 seeds in ONE
    # vmapped program vs one seed at the same per-policy env count.  The
    # single-policy update at small env counts is op-overhead-bound
    # (artifacts/roofline.json ppo_update: 17k-param GEMMs, ~0.04% MXU);
    # batching K policies turns them into K-batched GEMMs, so AGGREGATE
    # env-steps/s across the population must beat single-policy
    # (VERDICT r4 next #1b).  1024 envs/policy = the multi-seed
    # robustness-artifact shape, scaled up.
    from gym_pybullet_drones_tpu.rl import make_train_population
    K_pop = 8
    ppo_p = PPOConfig(num_envs=1024, rollout_steps=64, num_minibatches=4,
                      update_epochs=4)
    n_chain = 8
    rates_pop = {}
    for label, k in (("single", None), (f"pop{K_pop}", K_pop)):
        if k is None:
            init_k, upd_k, _, _ = make_train(
                cfg, HoverTask(act=ActionType.RPM), ppo_p)
        else:
            init_k, upd_k, _, _ = make_train_population(
                cfg, HoverTask(act=ActionType.RPM), ppo_p, k)
        ts_k = init_k(jax.random.key(0))
        upd_many = jax.jit(upd_k.many, static_argnums=1)
        ts_k, m = upd_many(ts_k, n_chain)
        float(jnp.sum(m["mean_reward"]))
        steps = n_chain * ppo_p.batch_size * (k or 1)
        best_k = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            ts_k, m = upd_many(ts_k, n_chain)
            float(jnp.sum(m["mean_reward"]))
            best_k = max(best_k, steps / (time.perf_counter() - t0))
        rates_pop[label] = best_k
    results.append({
        "metric": f"ppo_env_steps_per_sec_population{K_pop}x1024",
        "value": round(rates_pop[f"pop{K_pop}"], 1),
        "unit": "env-steps/s (aggregate over policies)",
        "single_policy_1024": round(rates_pop["single"], 1),
        "population_speedup": round(
            rates_pop[f"pop{K_pop}"] / rates_pop["single"], 2),
        "vs_baseline": round(rates_pop[f"pop{K_pop}"] / 1e7, 4)})

    # Pixel-based PPO: NatureCNN policy trained on the ray-traced RGB
    # observations, rollout rendering + conv forward/backward all in one
    # on-device program — a configuration the reference cannot train at
    # speed at all (TinyRenderer renders each frame on the host CPU)
    cfg = AviaryConfig(drone=P.CF2X, num_drones=1, physics=Physics.DYN,
                       pyb_freq=240, ctrl_freq=30)
    ppo = PPOConfig(num_envs=512, rollout_steps=32, num_minibatches=4,
                    update_epochs=2, lr=1e-4)
    init, update, _, _ = make_train(
        cfg, HoverTask(act=ActionType.ONE_D_RPM,
                       obs=ObservationType.RGB), ppo)
    ts = init(jax.random.key(0))
    upd = jax.jit(update)
    ts, m = upd(ts)
    float(m["mean_reward"])
    best = 0.0
    n_rep = 6
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_rep):
            ts, m = upd(ts)
        float(m["mean_reward"])
        best = max(best, n_rep * ppo.batch_size
                   / (time.perf_counter() - t0))
    results.append({"metric": "ppo_env_steps_per_sec_rgb512",
                    "value": round(best, 1), "unit": "env-steps/s",
                    "vs_baseline": round(best / 1e7, 4)})

    # Mesh scaling efficiency (needs >1 device, e.g. CPU with
    # xla_force_host_platform_device_count)
    n_dev = len(jax.devices())
    if n_dev > 1:
        from gym_pybullet_drones_tpu.parallel import (
            make_mesh, make_sharded_update, shard_train_state)
        ppo_s = PPOConfig(num_envs=64 * n_dev, rollout_steps=16,
                          num_minibatches=2, update_epochs=2)
        init, update, _, _ = make_train(
            cfg, HoverTask(act=ActionType.RPM), ppo_s)
        rates = {}
        for nd in (1, n_dev):
            mesh = make_mesh(jax.devices()[:nd])
            ts = shard_train_state(init(jax.random.key(0)), mesh)
            su = make_sharded_update(update, mesh)
            ts, m = su(ts)
            float(m["mean_reward"])
            t0 = time.perf_counter()
            for _ in range(3):
                ts, m = su(ts)
                float(m["mean_reward"])
            rates[nd] = 3 * ppo_s.batch_size / (time.perf_counter() - t0)
        eff = rates[n_dev] / (rates[1] * n_dev)
        results.append({"metric": f"mesh_scaling_efficiency_{n_dev}dev",
                        "value": round(eff, 3), "unit": "fraction",
                        "vs_baseline": round(rates[n_dev] / 1e7, 4)})

    for r in results:
        print(json.dumps(r))
    meta = {"platform": jax.devices()[0].platform,
            "device": str(jax.devices()[0]),
            "generated_by": "bench_all.py"}
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            args.out)
    with open(out_path, "w") as f:
        json.dump({"meta": meta, "results": results}, f, indent=1)
    print(f"-> {out_path}")


if __name__ == "__main__":
    main()
