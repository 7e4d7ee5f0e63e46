"""Merged field+trajectory step (experimental merged_step mode).

Invariants:
- the hand-written ONF backward matches jax.grad exactly (param grads over a
  row slice, position grads over the complement);
- a merged step reproduces the Jacobi step (same keys, same state) to f32
  reassociation tolerance, including the replay-buffer selection;
- multi-step runs stay equivalent and converge on the two-walls scene;
- works with angle_encoding off, collision_samples_per_segment > 1, and bf16.
"""
import numpy as np
import jax
import jax.numpy as jnp

from nfopp_tpu.models import ONFConfig, init_onf_params, onf_apply
from nfopp_tpu.solver import ConstrainedSolver, SolverConfig
from nfopp_tpu.experimental import ExperimentalConstrainedSolver
from nfopp_tpu.experimental.merged_step import onf_backward, onf_forward_acts
from nfopp_tpu.worlds import (
    CircleOracle,
    circle_collision,
    pad_obstacle_points,
    two_walls_se2_environment,
)


def tree_allclose(a, b, rtol=2e-4, atol=2e-5):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)


def make_solvers(**cfg_kwargs):
    env = two_walls_se2_environment()
    pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), 32)
    oracle = CircleOracle(
        jnp.asarray(pts), jnp.asarray(mask), jnp.float32(0.3),
        jnp.asarray([0.0, 3.0, 0.0, 3.0], jnp.float32),
    )
    base = SolverConfig(
        trajectory_length=12, collision_point_count=12, random_field_points=4,
        onf=ONFConfig(angle_encoding=True), angle_offset=0.3, **cfg_kwargs,
    )
    jc = ExperimentalConstrainedSolver(base, circle_collision, jacobi_step=True)
    mg = ExperimentalConstrainedSolver(base, circle_collision, merged_step=True)
    state = jc.init_state(
        jax.random.PRNGKey(0), env.start, env.goal,
        jnp.asarray(env.bounds, jnp.float32), oracle,
    )
    return jc, mg, state, oracle


class TestONFBackward:
    def _check(self, config):
        key = jax.random.PRNGKey(3)
        params = init_onf_params(key, config)
        x = jax.random.uniform(jax.random.PRNGKey(4), (23, 3), minval=-2.0, maxval=2.0)
        g = jax.random.normal(jax.random.PRNGKey(5), (23, 1))
        p = 15

        acts = onf_forward_acts(params, x, config)
        np.testing.assert_allclose(
            np.asarray(acts.logits), np.asarray(onf_apply(params, x, config)),
            rtol=1e-5, atol=1e-6,
        )
        param_grads, pos_grads = onf_backward(params, acts, g, p, config)

        # reference param grads: <g[:p], logits[:p]> via autodiff
        ref_param = jax.grad(
            lambda pr: jnp.sum(onf_apply(pr, x[:p], config) * g[:p])
        )(params)
        tree_allclose(param_grads, ref_param)

        # reference position grads: <g[p:], logits[p:]> wrt the points
        ref_pos = jax.grad(
            lambda q: jnp.sum(onf_apply(params, q, config) * g[p:])
        )(x[p:])
        np.testing.assert_allclose(
            np.asarray(pos_grads), np.asarray(ref_pos), rtol=2e-4, atol=1e-6
        )

    def test_angle_encoding(self):
        self._check(ONFConfig(angle_encoding=True))

    def test_no_angle_encoding(self):
        self._check(ONFConfig(angle_encoding=False))

    def test_no_cos(self):
        self._check(ONFConfig(use_cos=False, angle_encoding=True))


class TestMergedStep:
    def test_matches_jacobi_one_step(self):
        jc, mg, state, oracle = make_solvers()
        s_jc, aux_jc = jax.jit(jc.step)(state, oracle)
        s_mg, aux_mg = jax.jit(mg.step)(state, oracle)
        np.testing.assert_array_equal(
            np.asarray(s_jc.buffer_points), np.asarray(s_mg.buffer_points)
        )
        tree_allclose(s_jc.field_params, s_mg.field_params)
        tree_allclose(
            (s_jc.trajectory, s_jc.constraint_multipliers, s_jc.collision_multipliers),
            (s_mg.trajectory, s_mg.constraint_multipliers, s_mg.collision_multipliers),
        )
        np.testing.assert_allclose(
            float(aux_jc.field_loss), float(aux_mg.field_loss), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(aux_jc.trajectory_loss), float(aux_mg.trajectory_loss), rtol=1e-5
        )

    def test_matches_jacobi_run(self):
        jc, mg, state, oracle = make_solvers()
        s_jc, _ = jax.jit(lambda s: jc.run(s, oracle, 30))(state)
        s_mg, _ = jax.jit(lambda s: mg.run(s, oracle, 30))(state)
        tree_allclose(s_jc.trajectory, s_mg.trajectory, rtol=5e-3, atol=5e-4)

    def test_samples_per_segment(self):
        jc, mg, state, oracle = make_solvers(collision_samples_per_segment=3)
        s_jc, _ = jax.jit(jc.step)(state, oracle)
        s_mg, _ = jax.jit(mg.step)(state, oracle)
        tree_allclose(s_jc.trajectory, s_mg.trajectory)
        tree_allclose(s_jc.collision_multipliers, s_mg.collision_multipliers)

    def test_vmapped_batch(self):
        jc, mg, state, oracle = make_solvers()
        batch = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), state)
        oracles = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), oracle)
        s, aux = jax.jit(jax.vmap(lambda st, o: mg.run(st, o, 20)))(batch, oracles)
        assert s.trajectory.shape == (2, 12, 3)
        assert bool(jnp.all(jnp.isfinite(s.trajectory)))
        tree_allclose(s.trajectory[0], s.trajectory[1], rtol=0, atol=0)

    def test_grouped_lockstep(self):
        from nfopp_tpu.parallel import BatchPlanner, problem_mesh

        jc, mg, _, oracle = make_solvers()
        env = two_walls_se2_environment()
        batch = 4
        starts = jnp.tile(jnp.asarray(env.start)[None], (batch, 1))
        goals = jnp.tile(jnp.asarray(env.goal)[None], (batch, 1))
        bounds = jnp.tile(jnp.asarray(env.bounds, jnp.float32)[None], (batch, 1))
        oracles = jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * batch), oracle
        )
        planner = BatchPlanner(mg, problem_mesh(jax.devices()[:1]))
        states = planner.init_batch_grouped(
            jax.random.PRNGKey(0), starts, goals, bounds, oracles, group_size=2
        )
        out, _ = planner.run_grouped(states, oracles, 20, 2)
        for leaf in jax.tree_util.tree_leaves(out.field_params):
            arr = np.asarray(leaf)
            np.testing.assert_allclose(arr[0], arr[1], rtol=1e-6, atol=1e-7)
            assert not np.array_equal(arr[0], arr[2])
        # group_size=1 reproduces the plain vmapped merged run
        states1 = planner.init_batch(
            jax.random.PRNGKey(0), starts, goals, bounds, oracles
        )
        g1, _ = planner.run_grouped(states1, oracles, 20, 1)
        v1, _ = jax.jit(jax.vmap(lambda s, o: mg.run(s, o, 20)))(states1, oracles)
        tree_allclose(g1.trajectory, v1.trajectory, rtol=1e-5, atol=1e-6)

    def test_bf16_runs(self):
        _, mg, state, oracle = make_solvers()
        mg = ConstrainedSolver(
            mg.config._replace(onf=mg.config.onf._replace(compute_dtype="bfloat16")),
            circle_collision,
        )
        s, _ = jax.jit(lambda st: mg.run(st, oracle, 20))(state)
        assert bool(jnp.all(jnp.isfinite(s.trajectory)))
