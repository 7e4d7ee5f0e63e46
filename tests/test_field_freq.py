"""Static lowering of optimize_collision_model_freq (field-update stride).

The reference gates field training dynamically (step_count %
optimize_collision_model_freq == 0, nerf_opt_planner.py:62-63). Under vmap a
`lax.cond` executes both branches, so `run` lowers the freq to a static chunk
schedule when it divides reparametrize_trajectory_freq — the field update is
genuinely skipped, not computed-and-discarded. These tests pin that the static
schedule matches the reference-exact dynamic one (to f32 ulp — they are
different XLA programs) and that the field optimizer really steps
num_steps/freq times.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfopp_tpu.solver import ConstrainedSolver, HolonomicSolver, SolverConfig, run_planner_config
from nfopp_tpu.worlds import circle_collision, two_walls_environment, two_walls_se2_environment

from test_solver import make_circle_oracle


def _setup(field_freq: int):
    env = two_walls_se2_environment()
    oracle = make_circle_oracle(env)
    cfg = run_planner_config()._replace(optimize_collision_model_freq=field_freq)
    solver = ConstrainedSolver(cfg, circle_collision)
    state = solver.init_state(
        jax.random.PRNGKey(3), env.start, env.goal, jnp.asarray(env.bounds), oracle
    )
    return solver, state, oracle


def _adam_count(opt_state) -> int:
    import optax

    is_adam = lambda x: isinstance(x, optax.ScaleByAdamState)
    leaves = jax.tree_util.tree_leaves(opt_state, is_leaf=is_adam)
    return int(next(s.count for s in leaves if is_adam(s)))


class TestStaticFieldStride:
    def test_static_matches_dynamic_exactly(self):
        """Static schedule (freq=2 divides 10) == reference-exact dynamic scan.

        Both split 3 RNG keys per step, so the streams align; field fires at
        step_count 0, 2, 4, ... either way. 30 steps covers 3 reparam chunks.
        """
        solver, state, oracle = _setup(2)
        assert solver._static_field_stride() == 2
        s_static, aux_s = jax.jit(lambda s, o: solver.run(s, o, 30))(state, oracle)
        s_dyn, aux_d = jax.jit(
            lambda s, o: solver.run(s, o, 30, allow_static=False)
        )(state, oracle)
        # not bitwise: the two schedules are different XLA programs, so
        # fusion/reassociation differs at f32 ulp level
        np.testing.assert_allclose(
            np.asarray(s_static.trajectory), np.asarray(s_dyn.trajectory),
            atol=5e-6,
        )
        np.testing.assert_allclose(
            np.asarray(aux_s.field_loss), np.asarray(aux_d.field_loss),
            rtol=1e-4, atol=1e-5,
        )
        # skipped steps report field_loss 0 in both schedules
        fl = np.asarray(aux_s.field_loss)
        assert np.all(fl[1::2] == 0.0) and np.all(fl[0::2] != 0.0)

    def test_field_optimizer_steps_num_steps_over_freq(self):
        solver, state, oracle = _setup(5)
        out, _ = jax.jit(lambda s, o: solver.run(s, o, 20))(state, oracle)
        assert _adam_count(out.field_opt_state) == 4
        assert _adam_count(out.traj_opt_state) == 20

    def test_non_dividing_freq_keeps_dynamic_cond(self):
        solver, state, oracle = _setup(3)  # 3 does not divide 10
        assert solver._static_field_stride() == 1
        out, aux = jax.jit(lambda s, o: solver.run(s, o, 30))(state, oracle)
        ref, aux_d = jax.jit(
            lambda s, o: solver.run(s, o, 30, allow_static=False)
        )(state, oracle)
        np.testing.assert_allclose(
            np.asarray(out.trajectory), np.asarray(ref.trajectory), atol=5e-6
        )
        assert _adam_count(out.field_opt_state) == 10  # fires at 0,3,...,27

    def test_vmapped_run_static_stride(self):
        solver, state, oracle = _setup(2)
        batch = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (4,) + x.shape), state
        )
        batch = batch._replace(key=jax.random.split(jax.random.PRNGKey(7), 4))
        out, _ = jax.jit(
            jax.vmap(lambda s: solver.run(s, oracle, 20), in_axes=0)
        )(batch)
        assert _adam_count(jax.tree_util.tree_map(lambda x: x[0], out.field_opt_state)) == 10
        assert out.trajectory.shape == (4, solver.config.trajectory_length, 3)

    def test_grouped_run_static_stride(self):
        solver, state, oracle = _setup(2)
        batch = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (4,) + x.shape), state
        )
        batch = batch._replace(key=jax.random.split(jax.random.PRNGKey(9), 4))
        oracles = jax.tree_util.tree_map(
            lambda x: jnp.tile(x[None], (4,) + (1,) * x.ndim), oracle
        )
        out, _ = jax.jit(
            lambda s, o: solver.run_grouped(s, o, 20, group_size=2)
        )(batch, oracles)
        assert out.trajectory.shape == (4, solver.config.trajectory_length, 3)

    def test_grouped_group1_matches_vmapped_run(self):
        """run_grouped(group_size=1) under a field stride == vmapped run —
        numeric parity, not just shapes (advisor round-2 gap)."""
        solver, state, oracle = _setup(2)
        batch = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (4,) + x.shape), state
        )
        batch = batch._replace(key=jax.random.split(jax.random.PRNGKey(9), 4))
        oracles = jax.tree_util.tree_map(
            lambda x: jnp.tile(x[None], (4,) + (1,) * x.ndim), oracle
        )
        got, got_aux = jax.jit(
            lambda s, o: solver.run_grouped(s, o, 20, group_size=1)
        )(batch, oracles)
        ref, ref_aux = jax.jit(
            jax.vmap(lambda s, o: solver.run(s, o, 20))
        )(batch, oracles)
        np.testing.assert_allclose(
            np.asarray(got.trajectory), np.asarray(ref.trajectory), atol=5e-6
        )
        np.testing.assert_allclose(
            np.asarray(got_aux.field_loss), np.asarray(ref_aux.field_loss),
            rtol=1e-4, atol=1e-5,
        )

    def test_run_batch_static_stride_matches_vmapped_run(self):
        """run_batch's field-stride path vs vmapped run (advisor round-2 gap:
        the stride path through the multi-problem kernels was untested)."""
        from nfopp_tpu.experimental import ExperimentalConstrainedSolver

        solver, state, oracle = _setup(2)
        solver = ExperimentalConstrainedSolver(solver.config, solver.oracle_fn)
        batch = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (4,) + x.shape), state
        )
        batch = batch._replace(key=jax.random.split(jax.random.PRNGKey(11), 4))
        oracles = jax.tree_util.tree_map(
            lambda x: jnp.tile(x[None], (4,) + (1,) * x.ndim), oracle
        )
        got, got_aux = jax.jit(
            lambda s, o: solver.run_batch(s, o, 20, problems_per_program=2)
        )(batch, oracles)
        ref, ref_aux = jax.jit(
            jax.vmap(lambda s, o: solver.run(s, o, 20))
        )(batch, oracles)
        np.testing.assert_allclose(
            np.asarray(got.trajectory), np.asarray(ref.trajectory), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got_aux.field_loss), np.asarray(ref_aux.field_loss),
            rtol=1e-4, atol=1e-5,
        )
        assert _adam_count(
            jax.tree_util.tree_map(lambda x: x[0], got.field_opt_state)
        ) == 10

    def test_stride_equals_freq(self):
        """stride == freq (one field update per chunk; the inner group scan
        has length 0) — matches dynamic, field Adam steps num_steps/freq."""
        solver, state, oracle = _setup(10)
        assert solver._static_field_stride() == 10
        a, aux_s = jax.jit(lambda s, o: solver.run(s, o, 30))(state, oracle)
        b, _ = jax.jit(
            lambda s, o: solver.run(s, o, 30, allow_static=False)
        )(state, oracle)
        np.testing.assert_allclose(
            np.asarray(a.trajectory), np.asarray(b.trajectory), atol=5e-6
        )
        assert _adam_count(a.field_opt_state) == 3
        fl = np.asarray(aux_s.field_loss)
        assert np.all(fl[[0, 10, 20]] != 0.0)
        mask = np.ones(30, bool); mask[[0, 10, 20]] = False
        assert np.all(fl[mask] == 0.0)

    def test_holonomic_static_matches_dynamic(self):
        env = two_walls_environment()
        oracle = make_circle_oracle(env)
        from nfopp_tpu.models import ONFConfig
        cfg = SolverConfig(optimize_collision_model_freq=2,
                           onf=ONFConfig(angle_encoding=False))
        solver = HolonomicSolver(cfg, circle_collision)
        state = solver.init_state(
            jax.random.PRNGKey(1), env.start, env.goal, jnp.asarray(env.bounds), oracle
        )
        assert solver._static_field_stride() == 2
        a, _ = jax.jit(lambda s, o: solver.run(s, o, 20))(state, oracle)
        b, _ = jax.jit(lambda s, o: solver.run(s, o, 20, allow_static=False))(state, oracle)
        np.testing.assert_allclose(
            np.asarray(a.trajectory), np.asarray(b.trajectory), atol=5e-6
        )
        assert _adam_count(a.field_opt_state) == 10
