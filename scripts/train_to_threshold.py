"""Seeded training runs to the reference's solved thresholds (VERDICT #4).

Trains Hover (ONE_D_RPM, target 474.15) and optionally MultiHover (2 drones,
target 949.5) with the on-device PPO at a fixed seed, recording the full
evaluation curve to artifacts/learning_curve_<task>_seed<seed>.json.  The
thresholds are the reference's early-stop values
(/root/reference/gym_pybullet_drones/examples/learn.py:78-83).

Usage: python scripts/train_to_threshold.py [--multiagent] [--seed 0]
       [--platform cpu|tpu] [--max_updates 400]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--multiagent", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--max_updates", type=int, default=400)
    ap.add_argument("--num_envs", type=int, default=64)
    ap.add_argument("--anneal", action="store_true",
                    help="linear LR anneal over max_updates (used for the "
                         "committed Hover artifact: reaches 474.15 at "
                         "update 325 from seed 0)")
    args = ap.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from gym_pybullet_drones_tpu import params as P
    from gym_pybullet_drones_tpu.envs import (
        AviaryConfig, HoverTask, MultiHoverTask)
    from gym_pybullet_drones_tpu.rl import PPOConfig, make_train
    from gym_pybullet_drones_tpu.utils.enums import ActionType, Physics

    num_drones = 2 if args.multiagent else 1
    target = 949.5 if args.multiagent else 474.15
    name = "multihover" if args.multiagent else "hover"
    cfg = AviaryConfig(drone=P.CF2X, num_drones=num_drones,
                       physics=Physics.PYB, pyb_freq=240, ctrl_freq=30)
    task_cls = MultiHoverTask if args.multiagent else HoverTask
    task = task_cls(act=ActionType.ONE_D_RPM)
    ppo = PPOConfig(num_envs=args.num_envs, rollout_steps=64,
                    num_minibatches=4, update_epochs=10,
                    total_timesteps=args.max_updates * args.num_envs * 64,
                    anneal_lr=args.anneal)
    init, update, evaluate, _ = make_train(cfg, task, ppo)

    ts = init(jax.random.key(args.seed))
    upd = jax.jit(update)
    eval_fn = jax.jit(lambda p, k: evaluate(p, k, num_steps=8 * 30))

    curve = []
    start = time.time()
    reached_at = None
    for u in range(args.max_updates):
        ts, metrics = upd(ts)
        rets = eval_fn(ts.params, jax.random.key(u))
        mean_ret = float(jnp.mean(rets))
        curve.append({
            "update": u,
            "env_steps": (u + 1) * ppo.batch_size,
            "eval_return": mean_ret,
            "train_reward": float(metrics["mean_reward"]),
            "wall_s": round(time.time() - start, 1),
        })
        if u % 5 == 0 or mean_ret >= target:
            print(f"[{name} seed {args.seed}] update {u} "
                  f"steps={(u+1)*ppo.batch_size} eval={mean_ret:.2f} "
                  f"({time.time()-start:.0f}s)", flush=True)
        if mean_ret >= target:
            reached_at = u
            break

    out = {
        "task": name,
        "action_type": "one_d_rpm",
        "seed": args.seed,
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "target_reward": target,
        "reference_source":
            "gym_pybullet_drones/examples/learn.py:78-83",
        "reached": reached_at is not None,
        "reached_at_update": reached_at,
        "reached_at_env_steps":
            None if reached_at is None else (reached_at + 1) * ppo.batch_size,
        "total_wall_s": round(time.time() - start, 1),
        "ppo": {"num_envs": ppo.num_envs, "rollout_steps": ppo.rollout_steps,
                "num_minibatches": ppo.num_minibatches,
                "update_epochs": ppo.update_epochs, "lr": ppo.lr,
                "anneal_lr": ppo.anneal_lr},
        "curve": curve,
    }
    os.makedirs(os.path.join(os.path.dirname(__file__), "..", "artifacts"),
                exist_ok=True)
    path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        f"learning_curve_{name}_seed{args.seed}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[RESULT] {name}: reached={out['reached']} "
          f"at update {reached_at} -> {path}")
    return 0 if out["reached"] else 1


if __name__ == "__main__":
    sys.exit(main())
