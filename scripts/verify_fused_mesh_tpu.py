#!/usr/bin/env python
"""Real-backend check of the shard_map-wrapped fused kernel.

tests/test_fused_mesh.py proves multi-shard partitioning correctness on
the virtual 8-device CPU mesh with the kernel in INTERPRET mode; this
script closes the other half on the real accelerator: the shard_map
wrapper around the COMPILED Pallas kernel (1-device mesh — the only mesh
this host's single tunneled chip can form) is bitwise-identical to the
unsharded fused path for both kernel families (Hover-DYN and
Routing-PYB/PID).  Together: interpret+8-shard equality (CPU) and
compiled+wrapper equality (TPU) cover every layer of
make_fused_rollout(mesh=...) that can be exercised without real
multi-chip hardware.

Run: python scripts/verify_fused_mesh_tpu.py   (on the TPU backend)
Round-4 session result: both configs bitwise-equal over 3 control steps.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gym_pybullet_drones_tpu import params as P
    from gym_pybullet_drones_tpu.envs import (
        AviaryConfig, HoverTask, make_routing_config)
    from gym_pybullet_drones_tpu.envs.fast import make_fused_rollout
    from gym_pybullet_drones_tpu.parallel import make_mesh
    from gym_pybullet_drones_tpu.utils.enums import ActionType, Physics

    if jax.default_backend() == "cpu":
        print("needs a real accelerator (the CPU half of this proof is "
              "tests/test_fused_mesh.py)")
        return 1
    mesh = make_mesh(jax.devices()[:1])
    configs = {
        "hover-dyn": (
            AviaryConfig(drone=P.CF2X, num_drones=1, physics=Physics.DYN,
                         pyb_freq=240, ctrl_freq=30),
            HoverTask(act=ActionType.RPM)),
        "routing-pyb": make_routing_config(num_drones=3, spacing=0.4),
    }
    for name, (cfg, task) in configs.items():
        B, n = 128, cfg.num_drones
        _, act_dim = task.action_buffer_shape(cfg)
        s_reset, s_step = make_fused_rollout(cfg, task, B, mesh=mesh)
        u_reset, u_step = make_fused_rollout(cfg, task, B)
        sc, _ = s_reset()
        uc, _ = u_reset()
        ss, us = jax.jit(s_step), jax.jit(u_step)
        for t in range(3):
            a = 0.3 * jax.random.normal(jax.random.PRNGKey(t),
                                        (B, n, act_dim), jnp.float32)
            sc, so, sr, ste, strn = ss(sc, a)
            uc, uo, ur, ute, utrn = us(uc, a)
            np.testing.assert_array_equal(np.asarray(sc), np.asarray(uc))
            np.testing.assert_array_equal(np.asarray(so), np.asarray(uo))
            np.testing.assert_array_equal(np.asarray(sr), np.asarray(ur))
        print(f"{name}: shard_map-wrapped COMPILED kernel == unsharded, "
              "bitwise (3 control steps)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
