#!/usr/bin/env python3
"""Replan-cycle latency benchmark — the reference's ROS-mode budget check.

The reference replans at 10 Hz with a 0.1 s per-cycle stepping budget
(ros/goal_planner_adapter_factory.py:28, goal_planner_adapter.py:44-63). This
script drives the ReplanningService through moving-robot cycles on a
persistent planner and reports per-cycle wall-time percentiles and how many
optimization steps fit the budget.

    python scripts/replan_latency.py                 # TPU
    python scripts/replan_latency.py --cpu           # CPU (debug)

NOTE (axon tunnel): per-dispatch latency through the remote-TPU tunnel is
random 0.1-0.4 s, so absolute p50/p99 numbers on this machine measure the
tunnel, not the chip; steps-per-cycle and on-device per-step time are the
hardware-meaningful outputs (see CLAUDE.md timing caveats). On a local TPU
the wall percentiles are real.

--device-true instead runs K replan cycles INSIDE one jitted program
(service/session.py: scripted pose tracking + goal changes, the same
update_start/retarget/step sequence the host service performs per cycle) and
divides the session's device time by K — the hardware-true per-cycle latency.
Each cycle does identical fixed-shape, data-independent work, so the on-device
latency distribution is degenerate: the session mean IS the p50.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cycles", type=int, default=30)
    parser.add_argument("--timeout", type=float, default=0.1,
                        help="per-cycle stepping budget (reference: 0.1 s)")
    parser.add_argument("--steps-per-chunk", type=int, default=10)
    parser.add_argument("--fleet", type=int, default=0, metavar="N",
                        help="serve N robots on one map as a single batched "
                             "fleet (FleetReplanningService, shared field) "
                             "instead of the single-robot service")
    parser.add_argument("--subgroups", type=int, default=1, metavar="S",
                        help="device-true fleet: split the fleet into S "
                             "sequential sub-fleet bursts per cycle (one "
                             "shared field per sub-fleet) — the schedule for "
                             "fleets past the one-shot capacity cliff; in "
                             "--fleet-sweep use the 'R/S' size token instead")
    parser.add_argument("--group-size", type=int, default=None, metavar="G",
                        help="device-true fleet: robots per shared-field "
                             "group (default: whole sub-fleet). E.g. "
                             "--fleet 256 --group-size 128 runs ONE 256-robot "
                             "burst with two 128-robot field groups — "
                             "separates group-reduction width from program "
                             "width when probing the capacity cliff")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--device-true", action="store_true",
                        help="run the whole session inside ONE jitted program "
                             "(service.replan_session) and report per-cycle "
                             "device time — tunnel-noise-free")
    parser.add_argument("--goals", type=int, default=8,
                        help="device-true: scripted goal changes per session")
    parser.add_argument("--cycles-per-goal", type=int, default=None,
                        help="device-true: replan cycles between goal changes "
                             "(default 625, sized so a single-robot session "
                             "spans >=10 s on-device — the ONE tunnel "
                             "dispatch in the timed window then amortizes to "
                             "<2-3% instead of ~9% at the old 250; the fleet "
                             "sweep auto-scales per size unless this is set)")
    parser.add_argument("--steps-per-cycle", type=int, default=40,
                        help="device-true: optimization steps per cycle (must "
                             "be a multiple of the reparam freq; 40 matches "
                             "the tunnel-bound run's measured steps/cycle)")
    parser.add_argument("--fleet-sweep", default=None, metavar="SIZES",
                        help="device-true fleet-scaling curve: comma list of "
                             "fleet sizes (e.g. '1,8,32,64,128') — one shared "
                             "map, one shared field per fleet; reports "
                             "ms/cycle, robot-replans/s and steps fitting "
                             "the budget per size (REPLAN_r04). Session "
                             "lengths auto-scale so each spans >=20 s "
                             "on-device (dispatch jitter <2%)")
    parser.add_argument("--json-out", default=None,
                        help="also write the result JSON to this path")
    parser.add_argument("--aot", action="store_true",
                        help="device-true fleet paths: resolve the session "
                             "program through the AOT executable store "
                             "(first run compiles+saves; later runs start "
                             "with zero compile-service round trips)")
    parser.add_argument("--field-freq", type=int, default=1, metavar="S",
                        help="train the shared occupancy field every S-th "
                             "step (must divide the reparam freq 10 for the "
                             "static schedule). The fleet-serving speed "
                             "lever: a G-robot fleet on ONE map feeds the "
                             "shared field G samples-batches per training "
                             "step, so at fleet scale the field stays fresh "
                             "at a fraction of the per-step training rate — "
                             "and the field update is ~2/3 of the step's "
                             "dependency chain (BASELINE_MEASURED.md)")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from nfopp_tpu.utils import enable_tpu_compile_cache

    enable_tpu_compile_cache()  # TPU-only (backend-checked)

    import jax.numpy as jnp

    from nfopp_tpu.service import PathPostprocessor, ReplanningService
    from nfopp_tpu.solver import ConstrainedSolver, NFOPPlanner, run_planner_config
    from nfopp_tpu.worlds import (
        RectangleOracle,
        car_environment,
        pad_obstacle_points,
        rectangle_collision,
    )

    env = car_environment()
    pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), 64)
    oracle = RectangleOracle(
        jnp.asarray(pts), jnp.asarray(mask),
        jnp.asarray([-0.3, 0.2, -0.3, 0.2], jnp.float32),
        jnp.asarray([0.0, 3.0, 0.0, 3.0], jnp.float32),
    )
    config = run_planner_config()
    if args.field_freq > 1:
        if config.reparametrize_trajectory_freq % args.field_freq != 0:
            raise SystemExit(
                f"--field-freq {args.field_freq} must divide the reparam "
                f"freq {config.reparametrize_trajectory_freq} (static "
                "schedule; see bench.py --field-freq)"
            )
        config = config._replace(
            optimize_collision_model_freq=args.field_freq
        )
    solver = ConstrainedSolver(config, rectangle_collision)

    if args.device_true or args.fleet_sweep:
        import time as _time

        from nfopp_tpu.service import fleet_replan_session, replan_session

        start = jnp.asarray(env.start, jnp.float32)
        goal = jnp.asarray(env.goal, jnp.float32)
        bounds = jnp.asarray(env.bounds, jnp.float32)
        g, s = args.goals, args.steps_per_cycle
        c = args.cycles_per_goal if args.cycles_per_goal else 625
        total_cycles = g * c

        def timed_session(run_fn, warm_args, timed_args):
            # compile + warm (different inputs than timed, so tunnel replay
            # caching can't fake the timed run)
            _, warm_aux = run_fn(*warm_args)
            # drain the warm session BEFORE starting the clock; sync via a
            # scalar host fetch — block_until_ready is unreliable through the
            # tunnel (CLAUDE.md timing caveats)
            float(jnp.sum(warm_aux.path_length))
            t0 = _time.perf_counter()
            out, aux = run_fn(*timed_args)
            float(jnp.sum(aux.path_length))
            return _time.perf_counter() - t0, out, aux

        def fleet_quality(out, aux):
            """Quality of the session's FINAL plans (dense-check feasibility
            + mean xy length) — speed levers like --field-freq must not
            silently trade plan quality away."""
            from nfopp_tpu.solver.tracking import evaluate_path

            paths = jax.vmap(solver.full_trajectory)(out)
            collides, lengths = jax.jit(jax.vmap(
                lambda p: evaluate_path(rectangle_collision, oracle, p)
            ))(paths)
            return {
                "final_plans_feasible_frac": round(
                    float(1.0 - np.asarray(collides).mean()), 4
                ),
                "final_plans_mean_length": round(
                    float(np.asarray(lengths).mean()), 4
                ),
            }

        def fleet_setup(r: int, cycles_per_goal: int, subgroups: int = 1):
            """(compiled session fn, warm args, timed args) for an r-robot
            fleet on one shared map with one shared field per sub-fleet
            (subgroups=1: ONE field for the whole fleet). Robots in a group
            share a field_key so the replicas start identical — run_grouped's
            lockstep precondition (group-mean gradients assume identical
            replicas; distinct inits would silently freeze the initial
            offsets into every robot's field)."""
            group = args.group_size or (r // subgroups)
            if (r // subgroups) % group != 0:
                raise SystemExit(
                    f"--group-size {group} must divide the sub-fleet "
                    f"{r // subgroups}"
                )

            def mk(seed):
                kp, kf = jax.random.split(jax.random.PRNGKey(seed))
                keys = jax.random.split(kp, r)
                field_keys = jnp.repeat(
                    jax.random.split(kf, r // group), group, axis=0
                )
                return jax.jit(jax.vmap(
                    lambda k, fk: solver.init_state(
                        k, start, goal, bounds, oracle, field_key=fk
                    )
                ))(keys, field_keys)

            states_a, states_b = mk(1), mk(2)
            oracles = jax.tree_util.tree_map(
                lambda x: jnp.tile(x[None], (r,) + (1,) * x.ndim), oracle
            )
            base = jnp.stack(
                [goal if i % 2 == 0 else start for i in range(r)]
            )
            goals = jnp.stack(
                [base if j % 2 == 0 else base[::-1] for j in range(g)]
            )
            fn = jax.jit(lambda st, o, gl: fleet_replan_session(
                solver, st, o, gl, cycles_per_goal, s, group_size=group,
                subgroups=subgroups))
            aot_info = None
            if args.aot:
                from nfopp_tpu.utils.aot import (
                    aot_or_compile as aot_program, shape_digest,
                )

                warm = (states_a, oracles, goals)
                prog = aot_program(
                    f"session-fleet{r}", fn, warm, solver.config,
                    (r, cycles_per_goal, s, group, subgroups),
                    shape_digest(warm), verbose=True,
                )
                fn = prog
                aot_info = {"loaded": prog.loaded,
                            "seconds": round(prog.seconds, 2)}
            return (fn, (states_a, oracles, goals),
                    (states_b, oracles, goals), aot_info)

        if args.fleet_sweep:
            # fleet-scaling curve: ms/cycle and robot-replans/s per size.
            # cycles_per_goal auto-scales (predicted per-cycle ~2.2 ms +
            # ~0.3 ms/extra robot, the measured r=1/r=8 line) so every
            # session spans >=20 s on-device. A size token 'R/S' runs R
            # robots as S sequential sub-fleet bursts per cycle
            # (fleet_replan_session subgroups — the schedule for fleets past
            # the one-shot 256-robot capacity cliff, REPLAN_r04).
            sizes = []
            for tok in args.fleet_sweep.split(","):
                r_s = tok.split("/")
                sizes.append((int(r_s[0]),
                              int(r_s[1]) if len(r_s) > 1 else 1))
            rows = []
            for r, subgroups in sizes:
                pred_ms = 2.2 + 0.3 * max(0, r - 1)
                cpg = args.cycles_per_goal or int(
                    np.clip(round(20000.0 / pred_ms / g), 60, 625)
                )
                cycles_r = g * cpg
                if r <= 1:
                    mk1 = jax.jit(lambda k: solver.init_state(
                        k, start, goal, bounds, oracle))
                    sa, sb = mk1(jax.random.PRNGKey(1)), mk1(jax.random.PRNGKey(2))
                    goals_1 = jnp.stack(
                        [goal if j % 2 == 0 else start for j in range(g)]
                    )
                    fn = jax.jit(lambda st, o, gl: replan_session(
                        solver, st, o, gl, cpg, s))
                    wall, _, _ = timed_session(
                        fn, (sa, oracle, goals_1), (sb, oracle, goals_1)
                    )
                    quality = {}
                else:
                    fn, warm_a, timed_a, aot_info = fleet_setup(
                        r, cpg, subgroups
                    )
                    wall, out_f, aux_f = timed_session(fn, warm_a, timed_a)
                    quality = fleet_quality(out_f, aux_f)
                per_cycle_ms = wall / cycles_r * 1e3
                per_step_us = wall / (cycles_r * s) * 1e6
                row = {
                    "robots": r,
                    **({"subgroups": subgroups} if subgroups > 1 else {}),
                    **({"aot": aot_info} if r > 1 and aot_info else {}),
                    **quality,
                    "p50_ms": round(per_cycle_ms, 3),
                    "per_step_us": round(per_step_us, 2),
                    "steps_fitting_budget": int(
                        args.timeout / (per_step_us * 1e-6)
                    ),
                    "robot_replans_per_s": round(
                        max(r, 1) / (per_cycle_ms * 1e-3), 1
                    ),
                    "cycles": cycles_r,
                    "session_wall_s": round(wall, 2),
                }
                rows.append(row)
                print(json.dumps(row), file=sys.stderr, flush=True)
            result = {
                "metric": "fleet_replan_scaling_device_true",
                "budget_ms": args.timeout * 1e3,
                "steps_per_cycle": s,
                **({"field_freq": args.field_freq}
                   if args.field_freq > 1 else {}),
                "mode": "one shared map, ONE shared occupancy field per "
                        "fleet (run_grouped); robots alternate goal/start "
                        "targets with a retarget every cycles/goals cycles",
                "note": "one jitted session per size; fixed-shape cycles => "
                        "mean == p50; warm session uses different states and "
                        "is drained before the clock (CLAUDE.md)",
                "sizes": rows,
                "device": str(jax.devices()[0]),
            }
            out = json.dumps(result, indent=1)
            print(out)
            if args.json_out:
                pathlib.Path(args.json_out).write_text(out + "\n")
            return 0

        if args.fleet:
            r = args.fleet
            fn, warm_a, timed_a, aot_info = fleet_setup(r, c, args.subgroups)
            wall, out_f, aux_f = timed_session(fn, warm_a, timed_a)
            quality = fleet_quality(out_f, aux_f)
            per_cycle_ms = wall / total_cycles * 1e3
            per_step_us = wall / (total_cycles * s) * 1e6
            result = {
                "metric": "fleet_replan_cycle_latency_device_true",
                **quality,
                "robots": r,
                **({"subgroups": args.subgroups}
                   if args.subgroups > 1 else {}),
                **({"field_freq": args.field_freq}
                   if args.field_freq > 1 else {}),
                **({"group_size": args.group_size}
                   if args.group_size else {}),
                **({"aot": aot_info} if aot_info else {}),
                "p50_ms": round(per_cycle_ms, 3),
                "note": "one jitted session; fixed-shape cycles => mean == p50",
                "budget_ms": args.timeout * 1e3,
                "steps_per_cycle": s,
                "per_step_us": round(per_step_us, 2),
                "steps_fitting_budget": int(args.timeout / (per_step_us * 1e-6)),
                "goal_changes": g,
                "cycles": total_cycles,
                "session_wall_s": round(wall, 2),
                "robot_replans_per_s": round(r / (per_cycle_ms * 1e-3), 1),
                "device": str(jax.devices()[0]),
            }
            print(json.dumps(result))
            return 0

        mk1 = jax.jit(lambda k: solver.init_state(k, start, goal, bounds, oracle))
        state_a = mk1(jax.random.PRNGKey(1))
        state_b = mk1(jax.random.PRNGKey(2))
        goals = jnp.stack([goal if j % 2 == 0 else start for j in range(g)])
        fn = jax.jit(lambda st, o, gl: replan_session(solver, st, o, gl, c, s))
        wall, _, _ = timed_session(
            fn, (state_a, oracle, goals), (state_b, oracle, goals)
        )
        per_cycle_ms = wall / total_cycles * 1e3
        per_step_us = wall / (total_cycles * s) * 1e6
        result = {
            "metric": "replan_cycle_latency_device_true",
            "p50_ms": round(per_cycle_ms, 3),
            "note": "one jitted session; fixed-shape cycles => mean == p50",
            "budget_ms": args.timeout * 1e3,
            "steps_per_cycle": s,
            "per_step_us": round(per_step_us, 2),
            "steps_fitting_budget": int(args.timeout / (per_step_us * 1e-6)),
            "goal_changes": g,
            "cycles": total_cycles,
            "session_wall_s": round(wall, 2),
            "device": str(jax.devices()[0]),
        }
        print(json.dumps(result))
        return 0

    if args.fleet:
        from nfopp_tpu.service import FleetReplanningService

        svc = FleetReplanningService(
            solver, args.fleet, env.bounds, oracle,
            planning_timeout=args.timeout,
            steps_per_chunk=args.steps_per_chunk,
            postprocessor=PathPostprocessor(),
        )
        for r in range(args.fleet):
            svc.update_robot_pose(r, env.start if r % 2 == 0 else env.goal)
            assert svc.set_goal(r, env.goal if r % 2 == 0 else env.start)
        svc.replan_cycle()  # warm-up compiles the grouped chunk
        cycle_times, steps_per_cycle = [], []
        for _ in range(args.cycles):
            t0 = time.time()
            paths = svc.replan_cycle()
            cycle_times.append(time.time() - t0)
            steps_per_cycle.append(float(np.asarray(svc._states.step_count).mean()))
            for r, p in paths.items():
                if len(p) > 2:
                    svc.update_robot_pose(r, p[min(3, len(p) - 1)])
        cycle_times = np.asarray(cycle_times)
        steps = np.asarray(steps_per_cycle)
        result = {
            "metric": "fleet_replan_cycle_latency",
            "robots": args.fleet,
            "p50_ms": round(float(np.percentile(cycle_times, 50)) * 1e3, 2),
            "p90_ms": round(float(np.percentile(cycle_times, 90)) * 1e3, 2),
            "p99_ms": round(float(np.percentile(cycle_times, 99)) * 1e3, 2),
            "budget_ms": args.timeout * 1e3,
            "mean_steps_per_cycle": round(float(steps.mean()), 1),
            "robot_replans_per_s": round(
                args.fleet / float(cycle_times.mean()), 1
            ),
            "cycles": args.cycles,
            "device": str(jax.devices()[0]),
        }
        print(json.dumps(result))
        return 0

    planner = NFOPPlanner(solver, oracle)

    published = []
    service = ReplanningService(
        planner,
        planning_timeout=args.timeout,
        steps_per_chunk=args.steps_per_chunk,
        postprocessor=PathPostprocessor(),
        path_callback=published.append,
    )
    service.update_boundaries(env.bounds)
    service.update_robot_pose(env.start)
    assert service.set_goal(env.goal)
    # warm-up cycle compiles the chunked step
    service.replan_cycle()

    cycle_times, steps_per_cycle = [], []
    pose = np.asarray(env.start, np.float32)
    for _ in range(args.cycles):
        service.update_robot_pose(pose)
        t0 = time.time()
        path = service.replan_cycle()
        cycle_times.append(time.time() - t0)
        # update_start_point at the top of each cycle resets step_count, so
        # the post-cycle count IS the number of steps this cycle ran
        steps_per_cycle.append(int(planner.state.step_count))
        if path is not None and len(path) > 2:
            # robot follows the freshly planned path a little
            pose = np.asarray(path[min(3, len(path) - 1)], np.float32)

    cycle_times = np.asarray(cycle_times)
    steps = np.asarray(steps_per_cycle, float)
    result = {
        "metric": "replan_cycle_latency",
        "p50_ms": round(float(np.percentile(cycle_times, 50)) * 1e3, 2),
        "p90_ms": round(float(np.percentile(cycle_times, 90)) * 1e3, 2),
        "p99_ms": round(float(np.percentile(cycle_times, 99)) * 1e3, 2),
        "budget_ms": args.timeout * 1e3,
        "mean_steps_per_cycle": round(float(steps.mean()), 1),
        "cycles": args.cycles,
        "paths_published": len(published),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
