#!/usr/bin/env python3
"""Attributes the fused MG one-pass loss+grad cost (VERDICT r4 item 3:
"compute-bound has no measured headroom number") by component ablation, and
prices the candidate precision cuts of item 2.

Variants (each timed as the FULL one-pass loss+grad route -- the same
scanned-chain methodology as rescache_ablation.py / roofline.py):

  full         as shipped (real row function, split-operand exact dots)
  trivial-row  row function replaced by a minimal one that still touches
               every input plane and emits nterms terms: the delta bounds
               ALL row-function math (forward + in-kernel vjp + scatter
               cotangent arithmetic) -- no hand-written adjoint can save
               more than this
  no-matmul    _up2d/_down2d replaced by concat/slice stand-ins (same
               shapes, no MXU work): bounds the in-kernel ladder matmuls
  raw-bwd      _down2d at raw MXU precision (1 pass instead of the 3-pass
               split-operand dot): the price of keeping the backward
               cotangent projection split-exact, candidate for selective
               lowering (gradient-only rounding; forward stays exact)
  raw-both     _up2d and _down2d raw: the full in-kernel precision tax

The ablated variants compute WRONG results; this is a pricing tool.

Run on the TPU:  python benchmarks/kernel_ablation.py [--nx 256]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    import jax
    import jax.numpy as jnp

    parser = argparse.ArgumentParser()
    parser.add_argument("--nt", type=int, default=64)
    parser.add_argument("--nx", type=int, default=256)
    parser.add_argument("--length", type=int, default=200)
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--variants", type=str, default="",
                        help="comma-separated subset (default: all)")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (interpret-mode kernels; "
                             "sanity only -- the sandbox pins JAX_PLATFORMS)")
    args = parser.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from odil_tpu import transfer
    from odil_tpu.models import veltracer as vt
    from odil_tpu.ops import rowwise_mg

    def measure(label):
        problem, state, _ = vt.build(
            nt=args.nt, nx=args.nx, ny=args.nx, kernel="pallas_mg",
            multigrid=True, dtype=np.float32,
        )
        grad_fn = problem.make_loss_grad_fn(state)
        assert grad_fn is not None, "one-pass route declined"
        _, arrays = problem.make_loss_fn(state)
        x0 = [jnp.asarray(a) for a in arrays]

        def step(carry, _):
            x, t = carry
            (loss, _), g = grad_fn(x, {"epoch": t})
            return ([xi - 1e-30 * gi for xi, gi in zip(x, g)], t + 1), loss

        run = jax.jit(lambda c: jax.lax.scan(step, c, None, length=args.length))
        carry = (x0, jnp.asarray(0, jnp.int32))
        carry, out = run(carry)
        jax.block_until_ready(out)
        float(np.asarray(out)[-1])  # drain (axon-ready-before-done trap)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            carry, out = run(carry)
            float(np.asarray(out)[-1])
            times.append((time.perf_counter() - t0) / args.length)
        dt = float(np.median(times))
        print(f"{label}: {dt * 1e3:.4f} ms/iter  "
              f"reps={[round(t * 1e3, 4) for t in times]}", flush=True)
        return dt

    nterms = 6

    def measure_kernel_only(label, use_raw_down=False):
        """Times the mg one-pass KERNEL alone on precomputed partials --
        no XLA prologue (coarse Horner ladder), no epilogue (deeper-level
        transposes), no state update: the delta against the full route
        prices those XLA stages."""
        import jax.numpy as jnp

        problem, state, extra = vt.build(
            nt=args.nt, nx=args.nx, ny=args.nx, kernel="pallas_mg",
            multigrid=True, dtype=np.float32,
        )
        domain = problem.domain
        _, arrays = problem.make_loss_fn(state)
        domain.arrays_to_state([jnp.asarray(a) for a in arrays], state)
        partial = {}
        problem._flatten_multigrid_batched(state, partial_out=partial)
        keys = ("u", "vx", "vy")
        t0s = tuple(jnp.asarray(partial[k][0]) for k in keys)
        f0s = tuple(float(partial[k][1]) for k in keys)
        coarse = tuple(jnp.asarray(partial[k][2]) for k in keys)
        a = extra.args
        dt, dx, dy = map(float, domain.step())
        rf = vt._make_row_fn(domain.mod, dt, dx, dy, a.kimp, a.kxreg, a.ktreg)
        consts = (jnp.asarray(extra.u_init), jnp.asarray(extra.u_final))

        def step(carry, _):
            t0s_c, coarse_c = carry
            terms, (dt0, dcoarse, _) = rowwise_mg.rowwise_mg_loss_and_grads(
                rf, t0s=t0s_c, coarse=coarse_c, factors0=f0s,
                consts=consts, nterms=nterms, hist=1,
            )
            return (
                tuple(t - 1e-30 * d for t, d in zip(t0s_c, dt0)),
                tuple(c - 1e-30 * d for c, d in zip(coarse_c, dcoarse)),
            ), sum(terms)

        run = jax.jit(lambda c: jax.lax.scan(step, c, None, length=args.length))
        carry = (t0s, coarse)
        carry, out = run(carry)
        jax.block_until_ready(out)
        float(np.asarray(out)[-1])
        times = []
        for _ in range(args.reps):
            t0c = time.perf_counter()
            carry, out = run(carry)
            float(np.asarray(out)[-1])
            times.append((time.perf_counter() - t0c) / args.length)
        dtm = float(np.median(times))
        print(f"{label}: {dtm * 1e3:.4f} ms/iter  "
              f"reps={[round(t * 1e3, 4) for t in times]}", flush=True)
        return dtm

    def measure_vpu():
        """VPU-utilization attribution of the row math (VERDICT r4 item 3:
        '"compute-bound" has no measured headroom number').

        (a) Empirical VPU ceiling: a Pallas chain doing K register FMAs
            per element on (1, nx, nx) fp32 blocks -- same plane-blocked
            streaming as the kernels, arithmetic intensity 2K/8 flop/byte
            (K=128: 32 f/B, far past the HBM knee), so the measured
            FLOP/s is the achievable VPU rate for this access pattern.
        (b) Row-math FLOPs: XLA cost analysis of the vmapped-per-row
            forward + sumsq + vjp of the REAL row function over the full
            (T, nx, nx) grid -- the same work the one-pass kernel does
            per fine row, without the ladder matmuls or DMA machinery.
        Sustained row-math FLOP/s = (b) / the ablation's row-math time
        bound (full - trivial-row); utilization = that over (a)."""
        import jax.numpy as jnp
        from jax.experimental import pallas as pl

        T = args.nt + 1
        K = 128

        def fma_kernel(x_ref, o_ref):
            # One FMA chain per element.  The (256, 256) f32 tile spans 64
            # vregs, so the element-serial chain already carries 64-way
            # instruction-level parallelism -- measured: multi-accumulator
            # variants (2/4/8 chains) are SLOWER (1.58-1.61 TFLOP/s vs
            # 2.48) from register pressure; this form is the ceiling.
            x = x_ref[...]
            a = jnp.float32(1.0000001)
            b = jnp.float32(1e-7)
            for _ in range(K):
                x = x * a + b
            o_ref[...] = x

        spec = pl.BlockSpec((1, args.nx, args.nx), lambda i: (i, 0, 0))
        fma = pl.pallas_call(
            fma_kernel, grid=(T,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((T, args.nx, args.nx), jnp.float32),
        )
        run = jax.jit(
            lambda c: jax.lax.scan(lambda x, _: (fma(x), x[0, 0, 0]), c, None,
                                   length=args.length)
        )
        carry = jnp.asarray(np.random.rand(T, args.nx, args.nx), jnp.float32)
        carry, out = run(carry)
        jax.block_until_ready(out)
        float(np.asarray(out)[-1])
        times = []
        for _ in range(args.reps):
            t0c = time.perf_counter()
            carry, out = run(carry)
            float(np.asarray(out)[-1])
            times.append((time.perf_counter() - t0c) / args.length)
        dt_fma = float(np.median(times))
        cells = T * args.nx * args.nx
        ceiling_tflops = 2 * K * cells / dt_fma / 1e12
        print(f"vpu-ceiling: {dt_fma * 1e3:.4f} ms/iter = "
              f"{ceiling_tflops:.2f} TFLOP/s", flush=True)

        problem, state, extra = vt.build(
            nt=args.nt, nx=args.nx, ny=args.nx, kernel="pallas_mg",
            multigrid=True, dtype=np.float32,
        )
        domain = problem.domain
        a = extra.args
        dt, dx, dy = map(float, domain.step())
        rf = vt._make_row_fn(domain.mod, dt, dx, dy, a.kimp, a.kxreg, a.ktreg)
        consts = (jnp.asarray(extra.u_init), jnp.asarray(extra.u_final))

        def row_work(planes):
            # One row's work, vmapped over all T rows: forward residuals,
            # per-term sum-of-squares, and the vjp with the real
            # weight-scaled cotangents -- the kernel's per-row recipe
            # (ops/rowwise_mg.py backward) minus ladder/DMA machinery.
            prev = tuple(jnp.roll(p, 1, axis=0) for p in planes)

            def one(i, cur3, prev3):
                flat = (cur3[0], prev3[0], cur3[1], prev3[1], cur3[2], prev3[2])

                def f(*fl):
                    rws = ((fl[0], fl[1]), (fl[2], fl[3]), (fl[4], fl[5]))
                    return tuple(rf(i, T, rws, (), (), consts))

                res, vjp = jax.vjp(f, *flat)
                sums = tuple(jnp.sum(jnp.square(t)) for t in res)
                cots = vjp(tuple(2.0 * t for t in res))
                return sums, cots

            sums, cots = jax.vmap(one)(
                jnp.arange(T), jnp.stack(planes, 1), jnp.stack(prev, 1)
            )
            return sum(jnp.sum(s) for s in sums) + sum(
                jnp.sum(c) for c in cots
            )

        planes0 = tuple(
            jnp.asarray(np.random.rand(T, args.nx, args.nx), jnp.float32)
            for _ in range(3)
        )
        lowered = jax.jit(row_work).lower(planes0).compile()
        ca = lowered.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        row_flops = float(ca.get("flops", float("nan")))
        print(f"row-math flops (cost analysis): {row_flops / 1e9:.3f} G/eval",
              flush=True)
        return {"vpu_ceiling_tflops": round(ceiling_tflops, 2),
                "row_math_gflops_per_eval": round(row_flops / 1e9, 3)}

    def trivial_row_fn(it, T, rows, data_rows, params, consts_v):
        s = None
        for r in rows:
            for p in r:
                s = p if s is None else s + p
        for c in consts_v:
            s = s + c
        return tuple(s * (0.1 * (k + 1)) for k in range(nterms))

    def _reshape_nomm(x, A, B):
        # Shape-generic stand-in (works for the tiled kernels' widened
        # windows too): tile-and-slice to the matmul's output shape with
        # copies only -- no MXU work.
        reps = (-(-A // x.shape[0]), -(-B // x.shape[1]))
        return jnp.tile(x, reps)[:A, :B]

    def up2d_nomm(c, Wx, Wy):
        return _reshape_nomm(c, Wx.shape[0], Wy.shape[0])

    def down2d_nomm(d, Wx, Wy):
        return _reshape_nomm(d, Wx.shape[1], Wy.shape[1]) * 1.0

    def up2d_raw(c, Wx, Wy):
        return jnp.dot(Wx, jnp.dot(c, Wy.T, precision=jax.lax.Precision.DEFAULT),
                       precision=jax.lax.Precision.DEFAULT)

    def down2d_raw(d, Wx, Wy):
        return jnp.dot(Wx.T, jnp.dot(d, Wy, precision=jax.lax.Precision.DEFAULT),
                       precision=jax.lax.Precision.DEFAULT)

    base_up, base_down = rowwise_mg._up2d, rowwise_mg._down2d
    base_rowfn = vt._make_row_fn

    variants = {
        "full": dict(),
        "trivial-row": dict(rf=True),
        "no-matmul": dict(up=up2d_nomm, down=down2d_nomm),
        "raw-bwd": dict(down=down2d_raw),
        # Raw backward became the default in round 5; this variant prices
        # the OPT-BACK (ODIL_MG_BWD_DOT=split: the 3-pass split dot).
        "split-bwd": dict(down=lambda d, Wx, Wy: transfer.dot_wx(
            Wx.T, transfer.dot_xw(d, Wy))),
        "raw-both": dict(up=up2d_raw, down=down2d_raw),
    }
    if args.variants:
        sel = args.variants.split(",")
        variants = {k: v for k, v in variants.items() if k in sel}

    base_upf = rowwise_mg._up2d_fields
    base_downf = rowwise_mg._down2d_fields

    def upf_via_scalar(cs, Wx, Wy):
        return [rowwise_mg._up2d(c, Wx, Wy) for c in cs]

    def downf_via_scalar(ds, Wx, Wy):
        return [rowwise_mg._down2d(d, Wx, Wy) for d in ds]

    results = {}
    if not args.variants or "kernel-only" in args.variants.split(","):
        # The kernel-only probe drives the UNTILED kernel API directly;
        # beyond-VMEM shapes (512^2+) route tiled in production and would
        # die in the Mosaic compiler here -- skip them (the tiled
        # kernel-only numbers come from the direct probes in BENCH_NOTES).
        from odil_tpu.ops.rowwise_mg import MG_VMEM_LIMIT, mg_vmem_estimate

        shapes = ((args.nt + 1, args.nx, args.nx),) * 3
        if mg_vmem_estimate(shapes, np.float32, hist=1, nconsts=2) <= MG_VMEM_LIMIT:
            results["kernel-only"] = measure_kernel_only("kernel-only")
        else:
            print("kernel-only: skipped (beyond whole-plane VMEM; tiled route)",
                  flush=True)
    for name, cfg in variants.items():
        rowwise_mg._up2d = cfg.get("up", base_up)
        rowwise_mg._down2d = cfg.get("down", base_down)
        # Ablated variants route the field-batched entry points through
        # the (stubbed) scalar ones so the stubs cover them too.
        if "up" in cfg:
            rowwise_mg._up2d_fields = upf_via_scalar
        if "down" in cfg:
            rowwise_mg._down2d_fields = downf_via_scalar
        if cfg.get("rf"):
            vt._make_row_fn = lambda *a, **k: trivial_row_fn
        try:
            results[name] = measure(name)
        finally:
            rowwise_mg._up2d = base_up
            rowwise_mg._down2d = base_down
            rowwise_mg._up2d_fields = base_upf
            rowwise_mg._down2d_fields = base_downf
            vt._make_row_fn = base_rowfn

    vpu_stats = None
    if args.variants and "vpu" in args.variants.split(","):
        vpu_stats = measure_vpu()

    out = {"shape": [args.nt, args.nx, args.nx], "length": args.length,
           "ms_per_iter": {k: round(v * 1e3, 4) for k, v in results.items()}}
    if "full" in results:
        f = results["full"]
        for k, label in (("trivial-row", "row_math_bound_ms"),
                         ("no-matmul", "in_kernel_matmul_bound_ms"),
                         ("raw-bwd", "raw_bwd_saving_ms"),
                         ("raw-both", "raw_both_saving_ms"),
                         ("kernel-only", "xla_prologue_epilogue_ms")):
            if k in results:
                out[label] = round((f - results[k]) * 1e3, 4)
    if vpu_stats:
        out.update(vpu_stats)
        bound_ms = out.get("row_math_bound_ms")
        # Time the row math would need UNOVERLAPPED if every counted op
        # ran at the VPU FMA ceiling (cost-analysis ops are an upper
        # bound: selects/compares are counted but cheaper than FMAs).
        at_ceiling = (vpu_stats["row_math_gflops_per_eval"]
                      / vpu_stats["vpu_ceiling_tflops"])
        out["row_math_at_ceiling_ms"] = round(at_ceiling, 4)
        if bound_ms and bound_ms > 0:
            # marginal << at_ceiling means the row math is largely
            # overlapped with the DMA streams: the kernel's critical
            # path is streaming, not VPU compute, and a hand-written
            # adjoint can recover at most `row_math_bound_ms`.
            out["row_math_overlap_factor"] = round(at_ceiling / bound_ms, 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
