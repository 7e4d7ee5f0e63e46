#!/usr/bin/env python3
"""Microbenchmark: fused Pallas ONF kernels vs XLA batched path, same shapes.

Separates per-program overhead from memory/compute costs to guide the
multi-problem-per-program kernel design.
"""
from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--m", type=int, default=209)
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from nfopp_tpu.utils import enable_tpu_compile_cache

    enable_tpu_compile_cache()  # TPU-only (backend-checked)

    from nfopp_tpu.models import ONFConfig, init_onf_params, onf_apply
    from nfopp_tpu.experimental.pallas.onf_fused import onf_apply_fused
    from nfopp_tpu.solver import SolverConfig
    from nfopp_tpu.solver.field import field_loss_and_grad
    from nfopp_tpu.experimental.pallas.field_grad import field_loss_and_grad_fused

    onf = ONFConfig(mean=0.0, sigma=1.0, use_cos=True, angle_encoding=True)
    onf_bf16 = onf._replace(compute_dtype="bfloat16")
    B, M = args.batch, args.m
    params = jax.vmap(lambda k: init_onf_params(k, onf))(
        jax.random.split(jax.random.PRNGKey(0), B)
    )
    x = jnp.asarray(np.random.RandomState(0).randn(B, M, 3), jnp.float32)
    truth = jnp.asarray(np.random.RandomState(1).rand(B, M) > 0.5)
    interpret = jax.default_backend() == "cpu"

    def scan_time(tag, fn):
        def run(p, q):
            def body(c, _):
                out = fn(p, q + c)
                return c + 1e-9 * jnp.sum(jax.tree_util.tree_leaves(out)[0]), None

            c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=args.iters)
            return c

        f = jax.jit(run)
        t0 = time.time()
        jax.block_until_ready(f(params, x))
        compile_s = time.time() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(f(params, x))
            best = min(best, time.time() - t0)
        per = best / args.iters / B * 1e6
        print(f"{tag:40s} {per:8.3f} us/call/problem (compile {compile_s:.1f}s)")

    print(f"device={jax.devices()[0]} B={B} M={M}")
    scan_time("XLA forward f32",
              lambda p, q: jax.vmap(lambda pp, qq: onf_apply(pp, qq, onf))(p, q))
    scan_time("XLA forward bf16",
              lambda p, q: jax.vmap(lambda pp, qq: onf_apply(pp, qq, onf_bf16))(p, q))
    scan_time("Pallas fused forward f32",
              lambda p, q: onf_apply_fused(p, q, onf, interpret=interpret))

    cfg = SolverConfig(onf=onf)
    scan_time("XLA loss+grad f32",
              lambda p, q: jax.vmap(lambda pp, qq, tt: field_loss_and_grad(cfg, pp, qq, tt))(p, q, truth)[0])
    cfg16 = SolverConfig(onf=onf_bf16)
    scan_time("XLA loss+grad bf16",
              lambda p, q: jax.vmap(lambda pp, qq, tt: field_loss_and_grad(cfg16, pp, qq, tt))(p, q, truth)[0])
    scan_time("Pallas fused loss+grad f32",
              lambda p, q: jax.vmap(lambda pp, qq, tt: field_loss_and_grad_fused(onf, pp, qq, tt, interpret=interpret))(p, q, truth)[0])


if __name__ == "__main__":
    main()
