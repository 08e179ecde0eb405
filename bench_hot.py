"""Honest conv-rate probe + pallas A/B at the codec's hot shape.

Fixes two measurement bugs that shaped ARCHITECTURE.md item 7:
bench_conv2.py timed convs with ZERO kernels (constant-foldable) and
synced per call through the ~35 ms relay.  Here every operand is
random, and each measurement dispatches `n` dependent applications
(y = f(y)) before ONE sync, so device time dominates.

TF/s is always reported against the TRUE conv FLOPs (2*H*W*k*k*C*O),
so packing/lowering inflation shows up as a lower net rate.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from deepsvc_tpu.ops.packed import conv_h2, pack_kernel, space_to_depth  # noqa: E402
from deepsvc_tpu.ops.pallas_conv import conv3x3_h2, h2_pack_kernel3  # noqa: E402

H, W = 1088, 1920
SYNC = 0.0


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def t(name, fn, x0, flops=0, n=8, reps=3):
    """Median over `reps` of (n chained dispatches + one sync)/n."""
    y = fn(x0)
    sync(y)
    best = []
    for _ in range(reps):
        y = x0
        t0 = time.perf_counter()
        for _ in range(n):
            y = fn(y)
        sync(y)
        best.append((time.perf_counter() - t0 - SYNC / 1e3) / n)
    dt = float(np.median(best))
    tf = flops / dt / 1e12 if flops else 0
    print(f"{name:46s} {dt*1e3:8.2f} ms  {tf:6.1f} TF/s", flush=True)
    return dt


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

    # matmul peak sanity (honest: random weights, chained)
    A = jnp.asarray(rng.standard_normal((8192, 8192)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    t("matmul 8192^3 bf16", jax.jit(lambda a: (a @ A)), A,
      flops=2 * 8192**3, n=4)

    C = 64
    K = jnp.asarray(
        rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.05
    ).astype(jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal(C).astype(np.float32)).astype(
        jnp.bfloat16
    )
    fl = 2 * H * W * 9 * C * C
    x = jnp.asarray(rng.random((1, H, W, C), dtype=np.float32)).astype(
        jnp.bfloat16
    )

    def plain(a):
        return jax.lax.conv_general_dilated(
            a, K, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    t(f"conv3x3 {C}->{C} @{H}x{W} plain NHWC", jax.jit(plain), x, flops=fl)

    xp = x.reshape(1, H, W // 2, 2 * C)
    t(f"conv3x3 {C}->{C} h2 XLA (packed_io)",
      jax.jit(lambda a: conv_h2(a, K, b, dtype=jnp.bfloat16, packed_io=True)),
      xp, flops=fl)

    xs2 = space_to_depth(x)
    Kp_s2 = pack_kernel(K, 2).astype(jnp.bfloat16)
    t(f"conv3x3 {C}->{C} s2 XLA (packed_io)",
      jax.jit(lambda a: jax.lax.conv_general_dilated(
          a, Kp_s2, (1, 1), [(1, 1), (1, 1)],
          dimension_numbers=("NHWC", "HWIO", "NHWC"))),
      xs2, flops=fl)

    # the previously-claimed "fast regime", honest this time
    for (cc, hh, ww) in [(128, H // 2, W // 2), (256, H // 4, W // 4),
                         (128, H, W)]:
        Kc = jnp.asarray(
            rng.standard_normal((3, 3, cc, cc)).astype(np.float32) * 0.05
        ).astype(jnp.bfloat16)
        xc = jnp.asarray(
            rng.random((1, hh, ww, cc), dtype=np.float32)
        ).astype(jnp.bfloat16)
        t(f"conv3x3 {cc}->{cc} @{hh}x{ww} plain",
          jax.jit(lambda a, Kc=Kc: jax.lax.conv_general_dilated(
              a, Kc, (1, 1), [(1, 1), (1, 1)],
              dimension_numbers=("NHWC", "HWIO", "NHWC"))),
          xc, flops=2 * hh * ww * 9 * cc * cc)

    # pallas kernel, tile sweep
    Kp = h2_pack_kernel3(K)
    b2 = jnp.tile(b, 2)
    for th, twp in [(64, 120), (32, 240), (128, 120), (64, 240), (32, 120)]:
        try:
            t(f"conv3x3 h2 PALLAS tile ({th},{twp})",
              jax.jit(lambda a, th=th, twp=twp: conv3x3_h2(
                  a, Kp, b2, th=th, twp=twp)),
              xp, flops=fl)
        except Exception as e:
            print(f"pallas ({th},{twp}) failed: {type(e).__name__}: {e}"[:300],
                  flush=True)

    # fused ResBlock body: x + conv(lrelu(conv(x))) — pallas vs XLA h2
    def rb_xla(a):
        h = conv_h2(a, K, b, dtype=jnp.bfloat16, packed_io=True)
        h = jnp.where(h >= 0, h, 0.01 * h)
        return a + conv_h2(h, K, b, dtype=jnp.bfloat16, packed_io=True)

    def rb_pallas(a):
        h = conv3x3_h2(a, Kp, b2, slope=0.01)
        return conv3x3_h2(h, Kp, b2, a)

    t("ResBlock XLA h2", jax.jit(rb_xla), xp, flops=2 * fl)
    t("ResBlock PALLAS fused", jax.jit(rb_pallas), xp, flops=2 * fl)
    y0 = np.asarray(jax.jit(rb_xla)(xp), np.float32)
    y1 = np.asarray(jax.jit(rb_pallas)(xp), np.float32)
    print("ResBlock pallas-vs-XLA max |err|:", float(np.abs(y0 - y1).max()))


if __name__ == "__main__":
    main()
