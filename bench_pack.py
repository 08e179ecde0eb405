"""A/B probe: h2 vs full s2 (b=2) packing for the stride-1 full-res
conv chains (the mc_stage / recon_stage hot path).

The block chains currently run in the h2 packed view (2C lanes,
layers.py packed_io).  The s2 lowering (ops/packed.py packed_conv,
4C lanes at half spatial) was measured 200-300 TF/s for C in
{128, 256} on raw convs (bench_conv2) but never A/B'd as a CHAIN with
the reshape boundaries included.  This probe times, at 1088x1920 bf16:

  - single conv 3x3 C->C: unpacked / h2 / s2
  - a 4-block residual chain (conv+relu+conv+add): unpacked / h2 / s2
    (one pack/unpack pair around the whole chain, elementwise in the
    packed layout, like the packed_io block chains)

Effective TF/s is reported against the ORIGINAL conv FLOPs, so packing
inflation shows up as lower net rate, not hidden.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from deepsvc_tpu.ops.packed import (  # noqa: E402
    conv_h2,
    depth_to_space,
    packed_conv,
    space_to_depth,
)

H, W = 1088, 1920
SYNC = 0.0


def sync(x):
    np.asarray(x.ravel()[0])


def t(name, fn, *args, flops=0, n=3, reps=20):
    """Time one application of shape-preserving ``fn``.

    ``reps`` applications are CHAINED inside a single executable
    (fori_loop, each iteration feeding the next) so the ~40 ms relay
    sync amortizes 1/reps; the first probe version synced per call and
    printed negative-ms garbage for sub-ms ops."""
    assert len(args) == 1
    f_rep = jax.jit(
        lambda a: jax.lax.fori_loop(0, reps, lambda i, v: fn(v), a)
    )
    sync(f_rep(args[0]))  # compile + warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        sync(f_rep(args[0]))
        best = min(best, (time.perf_counter() - t0 - SYNC / 1e3) / reps)
    dt = best
    tf = flops / dt / 1e12 if flops else 0
    print(f"{name:52s} {dt*1e3:8.2f} ms  {tf:6.1f} TF/s", flush=True)
    return dt


def conv_plain(x, k_arr):
    p = k_arr.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, k_arr, (1, 1), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def main():
    global SYNC
    rng = np.random.default_rng(0)
    f_id = jax.jit(lambda x: x + 1)
    z = jnp.zeros((8, 128))
    sync(f_id(z))
    t0 = time.perf_counter()
    for _ in range(20):
        sync(f_id(z))
    SYNC = (time.perf_counter() - t0) / 20 * 1e3
    print(f"sync {SYNC:.1f} ms")

    for C, k in [(64, 3), (64, 5), (32, 3), (67, 3)]:
        x = jnp.asarray(
            rng.random((1, H, W, C), dtype=np.float32)
        ).astype(jnp.bfloat16)
        K = jnp.asarray(
            rng.standard_normal((k, k, C, C)).astype(np.float32) * 0.05
        )
        fl = 2 * H * W * k * k * C * C

        t(f"single conv{k}x{k}@{C} unpacked",
          jax.jit(lambda a, Kk=K: conv_plain(a, Kk.astype(a.dtype))),
          x, flops=fl)
        t(f"single conv{k}x{k}@{C} h2",
          jax.jit(lambda a, Kk=K: conv_h2(a, Kk, dtype=jnp.bfloat16)),
          x, flops=fl)
        t(f"single conv{k}x{k}@{C} s2",
          jax.jit(lambda a, Kk=K: depth_to_space(
              packed_conv(space_to_depth(a), Kk, dtype=jnp.bfloat16))),
          x, flops=fl)

    # 4-block residual chain at the mc/recon working width
    C, k, nblk = 64, 3, 4
    x = jnp.asarray(rng.random((1, H, W, C), dtype=np.float32)).astype(
        jnp.bfloat16
    )
    Ks = [
        jnp.asarray(rng.standard_normal((k, k, C, C)).astype(np.float32) * 0.05)
        for _ in range(2 * nblk)
    ]
    fl = 2 * H * W * k * k * C * C * 2 * nblk

    def chain_unpacked(a):
        for i in range(nblk):
            h = jax.nn.relu(conv_plain(a, Ks[2 * i].astype(a.dtype)))
            a = a + conv_plain(h, Ks[2 * i + 1].astype(a.dtype))
        return a

    def chain_h2(a):
        B, hh, ww, cc = a.shape
        ap = a.reshape(B, hh, ww // 2, 2 * cc)
        for i in range(nblk):
            h = jax.nn.relu(
                conv_h2(ap, Ks[2 * i], dtype=jnp.bfloat16, packed_io=True)
            )
            ap = ap + conv_h2(h, Ks[2 * i + 1], dtype=jnp.bfloat16,
                              packed_io=True)
        return ap.reshape(B, hh, ww, cc)

    def chain_s2(a):
        ap = space_to_depth(a)
        for i in range(nblk):
            h = jax.nn.relu(packed_conv(ap, Ks[2 * i], dtype=jnp.bfloat16))
            ap = ap + packed_conv(h, Ks[2 * i + 1], dtype=jnp.bfloat16)
        return depth_to_space(ap)

    a0 = t(f"chain {nblk}xResBlock@{C} unpacked", jax.jit(chain_unpacked), x,
           flops=fl)
    a1 = t(f"chain {nblk}xResBlock@{C} h2", jax.jit(chain_h2), x, flops=fl)
    a2 = t(f"chain {nblk}xResBlock@{C} s2", jax.jit(chain_s2), x, flops=fl)
    print(f"chain speedup: h2 {a0/a1:.2f}x  s2 {a0/a2:.2f}x")

    # numerical equivalence spot check (bf16 tolerance)
    y0 = np.asarray(jax.jit(chain_unpacked)(x), np.float32)
    y2 = np.asarray(jax.jit(chain_s2)(x), np.float32)
    print("chain s2 max |err|:", float(np.abs(y0 - y2).max()))


if __name__ == "__main__":
    main()
