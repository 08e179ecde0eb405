"""Benchmark: 1080p P-frame encode+decode throughput on one chip.

Measures the REAL bitstream path (device transforms + host rANS +
channel-AR slice decode loop) of the full-size P-frame codec at padded
1080p (1088x1920), the reference's headline operating point
(test_video.py HEVC-B/UVG suites, BASELINE.md).

Headline = PIPELINED stream throughput: the encoder reconstructs the
decoder state itself (video_model.py:137-151 semantics), so the encode
stream runs ahead while the decode stream's host rANS rounds hide under
encoder device compute.  fps_serial is the per-frame latency protocol
(encode fully, then decode fully, like /root/reference/test_video.py:340-351).

Also reported (VERDICT r2 item 2): per-stage breakdown (device encode,
host rANS, decode stall count x latency), transforms-only fps, an MFU
estimate against the measured 357 TF/s bf16 peak (ARCHITECTURE.md), and
a GOP-12 amortized fps including the full-size I-codec leg on a
synthetic moving-texture frame (not noise — VERDICT r2 weak 8).

vs_baseline: measured torch-CPU reference transforms (BASELINE_MEASURED
.json, scripts/measure_baseline.py) — traceable to a measurement;
vs_gpu_class_anchor keeps the round-1/2 comparable 1.0 fps GPU-class
anchor (prose estimate, BASELINE.md).

Prints ONE JSON line.

--space N: spatial-sharding correctness + halo overhead at 1080p on a
virtual N-device CPU mesh (VERDICT r2 item 3); separate invocation, not
part of the default TPU run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

H, W = 1088, 1920  # 1080p padded to x64 (test_video.py:294 protocol)
TINY = False  # --smoke: tiny model + 128x128 on CPU (code-path check only)
PEAK_TFLOPS = 357.0  # measured bf16 peak on this chip (ARCHITECTURE.md)
GPU_CLASS_ANCHOR_FPS = 1.0  # BASELINE.md prose anchor (kept for r1/r2 comparability)


def reference_cpu_fps() -> float | None:
    try:
        with open("BASELINE_MEASURED.json") as f:
            return float(json.load(f)["extrapolated_1080p"]["p_fps"])
    except (OSError, KeyError, ValueError):
        return None


def synthetic_frames(n, h, w, seed=0):
    """Moving-texture frames (data/synthetic distribution), (n, h, w, 3)."""
    from deepsvc_tpu.data.synthetic import make_clip_batch

    rng = np.random.default_rng(seed)
    return make_clip_batch(rng, frames=n, batch=1, height=h, width=w)[:, 0]


def _restore_artifact_snapshots(ckpt_root: str, art_dir: str | None = None) -> None:
    """Unpack committed checkpoint tarballs if the live dirs are gone.

    Only git-tracked files survive a machine rebuild between rounds;
    output/ is gitignored, so trained checkpoints would otherwise vanish
    before the driver's end-of-round bench (this killed round 4's first
    attempt).  scripts/snapshot_artifacts.sh writes artifacts/<run>.tar.gz
    for the runs the bench loads; this restores them on demand."""
    import tarfile

    art = art_dir or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts")
    if not os.path.isdir(art):
        return
    for f in os.listdir(art):
        if not f.endswith(".tar.gz"):
            continue
        run = f[: -len(".tar.gz")]
        dst = os.path.join(ckpt_root, run)
        if os.path.isdir(dst):
            continue
        os.makedirs(ckpt_root, exist_ok=True)
        try:
            with tarfile.open(os.path.join(art, f)) as t:
                t.extractall(ckpt_root)
            print(f"bench: restored {run} from artifacts/{f}", file=sys.stderr)
        except Exception as e:  # a bad tarball must not kill the bench
            print(f"bench: snapshot restore {f} failed: {e}", file=sys.stderr)


def stage_flops(jitted, *args) -> float:
    """Compiled-cost FLOPs of a jitted stage (0.0 if unavailable)."""
    try:
        c = jitted.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0.0))
    except Exception:
        return 0.0


def main_tpu(args):
    import jax

    if not TINY:  # CPU smoke uses its own cache dir (set before init;
        # /tmp/jax_cache holds TPU + foreign-machine CPU AOT artifacts)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from deepsvc_tpu.models import PFrameCodec, PFrameRuntime, init_pframe_variables

    if TINY:
        model = PFrameCodec(mv_latent=16, res_latent=16, dtype=jnp.float32)
    elif args.fast:
        model = PFrameCodec(me_base_scale=2, fuse_scale=2, dtype=jnp.bfloat16)
    else:
        model = PFrameCodec(dtype=jnp.bfloat16)
    variables = init_pframe_variables(model, jax.random.PRNGKey(0), H=128, W=128)
    jax.block_until_ready(variables)

    # Trained weights when available (VERDICT r3 item 7: random-weight
    # codecs make i_bpp/psnr meaningless).  Params are stored f32; the
    # bf16 model casts at compute time (layers.Conv), so the same
    # checkpoint serves training and the bf16 bench.
    ckpt_note = "random init"
    if not TINY:
        _restore_artifact_snapshots(args.ckpt_root)
    if not TINY and os.path.isdir(os.path.join(args.ckpt_root, "mse_640")):
        try:
            from deepsvc_tpu.train import TrainState, make_optimizer
            from deepsvc_tpu.utils.checkpoint import CheckpointManager

            tx = make_optimizer(variables)
            template = TrainState.create(variables, tx, jax.random.PRNGKey(0))
            mgr = CheckpointManager(
                os.path.join(args.ckpt_root, "mse_640", "checkpoints"))
            restored, step = mgr.restore(template)
            if restored is not None:
                variables = restored.params
                ckpt_note = f"{args.ckpt_root}/mse_640 step {step}"
                print(f"bench: loaded P checkpoint {ckpt_note}", file=sys.stderr)
        except Exception as e:
            print(f"bench: P checkpoint load failed ({e}); random init",
                  file=sys.stderr)
    rt = PFrameRuntime(model, variables)

    # --batch N: N independent streams ride one batch axis — device work
    # batches (amortizing dispatch latency and narrow-conv inefficiency)
    # and the rANS stream already carries the whole batch.  fps below are
    # AGGREGATE frames/s across streams; per-stream latency rises.
    B = max(1, int(args.batch))
    dt = jnp.float32 if TINY else jnp.bfloat16
    frames_np = synthetic_frames(args.frames + 2, H, W)
    if B == 1:
        frames = [jnp.asarray(f)[None].astype(dt) for f in frames_np]
    else:
        rolls = [np.roll(frames_np, 7 * b, axis=1) for b in range(B)]
        frames = [
            jnp.asarray(np.stack([r[t] for r in rolls])).astype(dt)
            for t in range(len(frames_np))
        ]
    sm = jnp.zeros((B, H // 4, W // 4, 256), dt)

    # ---- warmup / compile both pipelines ----
    h0 = rt.compress_pipelined(frames[0], frames[1], sm, None)
    mv_bs, res_bs = rt.finish(h0)
    job = rt.start_decompress(frames[0], mv_bs, res_bs, sm, None)
    while not job.step():
        pass
    dec0 = job.result
    del job  # the job pins full-res MC tensors (~0.8 GB at 1080p)
    h1 = rt.compress_pipelined(dec0["recon"], frames[2], sm, dec0["feature"])
    rt.finish(h1)
    jax.block_until_ready(h1["recon"])
    del h0, h1

    # ---- serial protocol loop (per-frame latency; r2-comparable) ----
    # >=8 samples so the dispersion fields below mean something: shared-
    # box relay noise made cross-round deltas near +-15% unresolvable
    # on 4-frame runs (VERDICT r5 weak #8 / item 9)
    ref_f, feat_f = dec0["recon"], dec0["feature"]
    serial_times, enc_dev, enc_rans, dec_rounds = [], [], [], []
    for t in range(min(args.frames, 8)):
        curr = frames[2 + (t % (len(frames) - 2))]
        t0 = time.perf_counter()
        mv_bs, res_bs = rt.compress(ref_f, curr, sm, feat_f)
        t1 = time.perf_counter()
        dec = rt.decompress(ref_f, mv_bs, res_bs, sm, feat_f)
        np.asarray(dec["recon"].ravel()[0])
        serial_times.append(time.perf_counter() - t0)
        ref_f, feat_f = dec["recon"], dec["feature"]
        for crt in (rt.mv_rt, rt.res_rt):
            tm = crt.timings
            enc_dev.append(tm.get("enc_device+d2h", 0.0))
            enc_rans.append(tm.get("enc_host_rans", 0.0))
            dec_rounds.extend(tm.get("dec_steps", []))
        _ = t1
    fps_serial = B / float(np.median(serial_times))
    # sustained-throughput twin of fps_serial: total wall over all serial
    # frames, the same protocol the pipelined legs use.  The median number
    # discards warmup/outlier frames, so comparing IT against pipelined
    # wall-clock throughput systematically favors serial; headline
    # serial-vs-pipelined comparisons must use this one.
    fps_serial_wall = len(serial_times) * B / float(sum(serial_times))
    # dispersion: cross-round perf claims are gated on non-overlapping
    # spreads, so the spread ships with the number (VERDICT r5 item 9)
    serial_p50_s = float(np.percentile(serial_times, 50))
    serial_p90_s = float(np.percentile(serial_times, 90))
    stalls = [r[0] for r in dec_rounds]  # idx-pull blocking time per round
    rans = [r[1] for r in dec_rounds]

    # ---- pipelined stream throughput (headline) ----
    # One-frame LOOKAHEAD: frame k's encode is dispatched (device) BEFORE
    # frame k-1's bitstream finish (host rANS), so the encoder's rANS
    # runs while the device chews on frame k; frame k-2's decode rounds
    # pump between frame k's dispatch groups.  Encode(k) depends only on
    # h(k-1)'s device tensors (recon/feature), never on bytes, so this
    # is a scheduling change only — streams/recons are identical.
    # Falls back to the no-lookahead schedule (finish immediately after
    # each encode — one less frame of handles held) if the lookahead
    # window exhausts HBM; bench must never die on the driver's run.
    n_pipe = args.frames

    def _run_pipelined(lookahead: bool):
        ref_e, feat_e = dec0["recon"], dec0["feature"]
        prev = None  # frame k-1: dict(h, ref, feat) — encoded, not finished
        pend = None  # (decode job, encoder-side recon for equality check)
        errs = []  # device-side max-|err| scalars, pulled after the loop

        def _drain(p):
            job, enc_recon = p
            while not job.step():  # drain rounds the pump didn't reach
                pass
            errs.append(
                jnp.abs(
                    job.result["recon"].astype(jnp.float32)
                    - enc_recon.astype(jnp.float32)
                ).max()
            )
            return job

        t0 = time.perf_counter()
        for k in range(n_pipe):
            curr = frames[2 + (k % (len(frames) - 2))]
            pump = pend[0].step if pend is not None else None
            h = rt.compress_pipelined(ref_e, curr, sm, feat_e, pump=pump)
            me = {"h": h, "ref": ref_e, "feat": feat_e}
            ref_e, feat_e = h["recon"], h["feature"]
            del h
            if pend is not None:
                _drain(pend)
                pend = None
            ready = me if not lookahead else prev
            if ready is not None:
                # host rANS here overlaps frame k(+1)'s queued device work
                mv_bs, res_bs = rt.finish(ready["h"])
                pend = (
                    rt.start_decompress(ready["ref"], mv_bs, res_bs, sm,
                                        ready["feat"]),
                    ready["h"]["recon"],
                )
            prev = me if lookahead else None
        # epilogue: drain frame n-2, finish + decode frame n-1
        if pend is not None:
            job = _drain(pend)
        if prev is not None:
            mv_bs, res_bs = rt.finish(prev["h"])
            job = _drain((
                rt.start_decompress(prev["ref"], mv_bs, res_bs, sm,
                                    prev["feat"]),
                prev["h"]["recon"],
            ))
        np.asarray(job.result["recon"].ravel()[0])
        fps = n_pipe * B / (time.perf_counter() - t0)
        # materialize the equality scalars NOW: a later schedule's OOM
        # must not be able to poison this schedule's pending results
        return fps, [float(e) for e in errs]

    def _run_pipelined_threaded():
        """Decoder rounds drained by a WORKER THREAD.

        Through a relay every idx pull costs ~35 ms of pure round-trip
        latency; pumped on the main thread (the lookahead schedule) that
        latency serializes with encode dispatch — the device queue
        drains during the relay wait and the device idles (measured:
        pipelined 1.38 s/frame == device 0.95 + 10 pulls x 35 ms + rANS,
        bench r3).  A worker thread eats the relay waits (PJRT pulls and
        the ctypes rANS calls release the GIL) while the main thread
        keeps the device queue fed with the next frame's encode.
        Bit-exactness is untouched: thread scheduling changes dispatch
        ORDER only, never any program or its inputs."""
        from concurrent.futures import ThreadPoolExecutor

        def _finish_and_decode(hh, ref, feat, enc_recon):
            mv_bs, res_bs = rt.finish(hh)
            job = rt.start_decompress(ref, mv_bs, res_bs, sm, feat)
            while not job.step():
                pass
            # return ONLY the equality scalar: the job's full-res MC/recon
            # tensors (~0.3 GB/frame) die here — retaining every job until
            # function exit exhausted HBM and the OOM surfaced two legs
            # later, in transforms-only (bench r3, rc=1)
            err = jnp.abs(
                job.result["recon"].astype(jnp.float32)
                - enc_recon.astype(jnp.float32)
            ).max()
            return err

        ref_e, feat_e = dec0["recon"], dec0["feature"]
        prev = None
        futs = []  # future -> device scalar max|err|
        with ThreadPoolExecutor(max_workers=1) as ex:
            t0 = time.perf_counter()
            for k in range(n_pipe):
                curr = frames[2 + (k % (len(frames) - 2))]
                h = rt.compress_pipelined(ref_e, curr, sm, feat_e)
                me = {"h": h, "ref": ref_e, "feat": feat_e}
                ref_e, feat_e = h["recon"], h["feature"]
                del h
                if prev is not None:
                    futs.append(ex.submit(
                        _finish_and_decode, prev["h"], prev["ref"],
                        prev["feat"], prev["h"]["recon"]))
                    if len(futs) > 2:  # back-pressure: bound the window of
                        # live handles (~0.3 GB/frame) so a lagging worker
                        # cannot accumulate frames until HBM exhausts
                        futs[-3].result()
                prev = me
            futs.append(ex.submit(
                _finish_and_decode, prev["h"], prev["ref"], prev["feat"],
                prev["h"]["recon"]))
            errs_dev = [f.result() for f in futs]
            # one pull ends the clock: the device executes in order, so
            # the last err scalar being ready implies every prior frame's
            # decode work is done
            _ = float(errs_dev[-1])
            fps = n_pipe * B / (time.perf_counter() - t0)
        return fps, [float(e) for e in errs_dev]

    def _run_pipelined_gop(gop: int | None = None):
        """GOP-batched decode behind a one-GOP encode lookahead.

        Per-frame decode pays 10 relay pulls x ~35 ms; decompress_gop
        rides ALL frames' entropy chains on ONE pull per round
        (measured: 0.229 -> 0.117 s/frame stall at gop=4).  Decoding
        GOP i only after GOP i+1's encodes are dispatched keeps the
        device queue full during those pulls, so the residual stall
        hides under queued encode work.  Throughput schedule (serving);
        per-frame latency is fps_serial's number.  Bit-exactness: the
        decoder consumes the encoder-produced reference tensors and
        bitstreams, same as every other schedule."""
        # clamp: gop < 1 would make the while loop below never advance
        gop = max(1, int(args.gop) if gop is None else gop)
        ref_e, feat_e = dec0["recon"], dec0["feature"]
        errs_dev, pend, k = [], None, 0

        def _encode_gop(k, g, pump):
            """Encode g frames; ``pump`` (the pending GOP-decode job's
            step) advances decode host rounds between dispatch groups so
            each relay pull waits on queued encode work instead of
            idling the device (r3's schedule decoded only after the
            whole next GOP was encoded: 0.14 s/frame naked stall)."""
            nonlocal ref_e, feat_e
            anchor = (ref_e, feat_e)
            streams, recons = [], []
            for j in range(g):
                curr = frames[2 + ((k + j) % (len(frames) - 2))]
                h = rt.compress_pipelined(ref_e, curr, sm, feat_e, pump=pump)
                streams.append(rt.finish(h))  # host rANS overlaps device
                recons.append(h["recon"])
                ref_e, feat_e = h["recon"], h["feature"]
                del h
            return anchor, streams, recons

        def _start_decode(p):
            (ref_d, feat_d), streams, recons = p
            # light: only recon survives per frame — a per-frame 64ch
            # feature reference (267 MB/stream at 1080p) OOMed every
            # B=2 schedule in r3
            return (rt.start_decompress_gop(ref_d, streams, sm, feat_d,
                                            light=True), recons)

        def _drain(job, recons):
            while not job.step():
                pass
            for o, r_enc in zip(job.result, recons):
                errs_dev.append(jnp.abs(
                    o["recon"].astype(jnp.float32)
                    - r_enc.astype(jnp.float32)
                ).max())

        t0 = time.perf_counter()
        while k < n_pipe:
            g = min(gop, n_pipe - k)
            me = _encode_gop(k, g, pend[0].step if pend else None)
            if pend is not None:
                _drain(*pend)
            pend = _start_decode(me)
            k += g
        _drain(*pend)
        _ = float(errs_dev[-1])  # in-order device: everything is done
        fps = n_pipe * B / (time.perf_counter() - t0)
        return fps, [float(e) for e in errs_dev]

    # First success wins: running a second schedule on top of a completed
    # one doubles the live-handle footprint and OOMed the chip (measured).
    # gop_pipeline and decode_thread lost to the serial protocol in BOTH
    # r4 and r5 driver captures (gop_pipeline 0.70/0.42 vs serial
    # 1.08/0.96) while first-success-wins meant lookahead never even got
    # measured — so the dead modes no longer run by default (VERDICT r5
    # weak #2); they remain reachable via --schedule for A/B sweeps.
    candidates = [
        ("lookahead", lambda: _run_pipelined(True)),
        ("no_lookahead", lambda: _run_pipelined(False)),
    ]
    if args.schedule:  # force one schedule (A/B sweeps; incl. retired modes)
        all_scheds = dict(candidates + [
            ("gop_pipeline", _run_pipelined_gop),
            ("decode_thread", _run_pipelined_threaded),
        ])
        candidates = [(args.schedule, all_scheds[args.schedule])]
    fps_pipe, errs, pipelined_mode, attempts = 0.0, None, "none", {}
    for name, fn in candidates:
        try:
            fps_pipe, errs = fn()
            attempts[name] = round(fps_pipe, 4)
            pipelined_mode = name
            break
        except Exception as exc:  # HBM RESOURCE_EXHAUSTED etc.
            print(f"pipelined schedule {name} failed "
                  f"({type(exc).__name__}: {exc})", file=sys.stderr)
            attempts[name] = f"{type(exc).__name__}"
            import gc

            gc.collect()  # free the dead window's buffers before retry
    if errs is None:
        # bench must still emit its JSON line for the driver; report the
        # serial number as the stream number and flag it loudly
        print(f"every pipelined schedule failed: {attempts}", file=sys.stderr)
        fps_pipe, errs, pipelined_mode = fps_serial_wall, [], "serial_fallback"
    elif fps_serial_wall > fps_pipe and not args.schedule:
        # the serial protocol is the same complete encode+decode path;
        # when a pipelined schedule loses to it (relay weather, pump
        # overhead on a slow box) the headline is the best REAL number,
        # not the first schedule that happened to finish.  Compared on
        # equal footing: sustained wall-clock throughput on both sides
        # (median-based fps_serial drops outliers and would win unfairly
        # on noisy runs).  A forced --schedule run must report the
        # schedule under test, never swap in serial.
        attempts["serial"] = round(fps_serial_wall, 4)
        fps_pipe, errs, pipelined_mode = fps_serial_wall, errs, "serial_best"
    import gc

    gc.collect()  # drop the winning schedule's window before the next legs
    # encoder drives the decoder's executables (codec_runtime.start_
    # compress), so encoder-side recon == decoder recon BITWISE; any
    # nonzero here is a real desync and the number above is invalid
    max_err = float(max(float(e) for e in errs)) if errs else 0.0
    if max_err != 0.0:
        print(f"WARNING: pipelined encoder/decoder recon mismatch "
              f"max|err|={max_err} — bitstream path desynced", file=sys.stderr)

    # ---- GOP-interleaved decode (serving path): all frames' entropy
    # chains ride ONE host pull per round (pframe_runtime.decompress_gop),
    # so the relay-latency stall amortizes over the GOP ----
    gop_leg = {}
    try:
        n_gop = max(1, int(args.gop))  # same GOP size as the gop_pipeline leg
        streams, ref_g, feat_g = [], dec0["recon"], dec0["feature"]
        for t in range(n_gop):
            hg = rt.compress_pipelined(ref_g, frames[2 + t % 2], sm, feat_g)
            streams.append(rt.finish(hg))
            ref_g, feat_g = hg["recon"], hg["feature"]
        # warm the tail executables + retraced concat, then time
        outs = rt.decompress_gop(dec0["recon"], streams, sm, dec0["feature"])
        np.asarray(outs[-1]["recon"].ravel()[0])
        t0 = time.perf_counter()
        outs = rt.decompress_gop(dec0["recon"], streams, sm, dec0["feature"])
        np.asarray(outs[-1]["recon"].ravel()[0])
        gop_s = time.perf_counter() - t0
        # equality with the pipelined encoder's recon (bitwise contract)
        g_err = float(
            jnp.abs(
                outs[-1]["recon"].astype(jnp.float32) - ref_g.astype(jnp.float32)
            ).max()
        )
        gop_leg = {
            "gop_decode_fps": round(n_gop * B / gop_s, 4),
            "gop_decode_stall_s_per_frame": round(
                float(np.sum(rt.gop_times)) / n_gop, 4
            ),
            "gop_decode_equality_max_err": g_err,
        }
    except Exception as e:  # must never take down the headline bench
        gop_leg = {"gop_decode_error": f"{type(e).__name__}: {e}"[:200]}

    # ---- transforms-only fps (no host coder on the critical path) ----
    # non-fatal like the GOP leg: a leg-local OOM must not kill the JSON
    fps_transforms, mfu, flops = 0.0, 0.0, 0.0
    try:
        t0 = time.perf_counter()
        r, ft = dec0["recon"], dec0["feature"]
        for t in range(4):
            h = rt.compress_pipelined(r, frames[2 + t % 2], sm, ft)
            r, ft = h["recon"], h["feature"]
        jax.block_until_ready(r)
        transforms_s = (time.perf_counter() - t0) / 4
        fps_transforms = B / transforms_s
        del r, ft, h

        # ---- MFU estimate over the encode transform chain ----
        v = rt.variables
        mv_in = rt._motion(v, frames[0], frames[1])
        flops = stage_flops(rt._motion, v, frames[0], frames[1])
        flops += stage_flops(rt.mv_rt._encode, rt.mv_rt.variables, mv_in, None)
        mc = rt._mc(v, frames[0], jnp.zeros((1, H, W, 2), jnp.bfloat16), sm,
                    None)
        flops += stage_flops(rt._mc, v, frames[0],
                             jnp.zeros((1, H, W, 2), jnp.bfloat16), sm, None)
        res_in = rt._res_in(v, frames[0], frames[1], mc["predict_frame"],
                            mc["predict_fea"])
        flops += stage_flops(rt._res_in, v, frames[0], frames[1],
                             mc["predict_frame"], mc["predict_fea"])
        flops += stage_flops(rt.res_rt._encode, rt.res_rt.variables, res_in,
                             None)
        mfu = (flops / transforms_s) / (PEAK_TFLOPS * 1e12) if flops else 0.0
        del mv_in, mc, res_in
    except Exception as e:
        print(f"transforms/MFU leg failed ({type(e).__name__}: {e})",
              file=sys.stderr)
    gc.collect()

    # ---- I-frame leg on a real textured frame (VERDICT r2 weak 8) ----
    i_leg = {}
    if not args.no_iframe:
      try:
        from deepsvc_tpu.models import CodecRuntime, ImageCodec

        i_model = ImageCodec(dtype=jnp.bfloat16)
        i_vars = jax.jit(
            lambda r: i_model.init({"params": r}, jnp.zeros((1, 128, 128, 3)),
                                   rng=jax.random.PRNGKey(1))
        )(jax.random.PRNGKey(0))
        jax.block_until_ready(i_vars)
        i_ckpt_note = "random init"
        if os.path.isdir(os.path.join(args.ckpt_root, "image_mse_640")):
            try:
                from deepsvc_tpu.train import TrainState, make_optimizer
                from deepsvc_tpu.utils.checkpoint import CheckpointManager

                tx = make_optimizer(i_vars)
                template = TrainState.create(i_vars, tx, jax.random.PRNGKey(0))
                mgr = CheckpointManager(
                    os.path.join(args.ckpt_root, "image_mse_640", "checkpoints"))
                restored, step = mgr.restore(template)
                if restored is not None:
                    i_vars = restored.params
                    i_ckpt_note = f"{args.ckpt_root}/image_mse_640 step {step}"
                    print(f"bench: loaded I checkpoint {i_ckpt_note}",
                          file=sys.stderr)
            except Exception as e:
                print(f"bench: I checkpoint load failed ({e}); random init",
                      file=sys.stderr)
        i_rt = CodecRuntime(i_model, i_vars, encoder_xhat=False)
        x_i = frames[0]
        i_enc_t, i_dec_t, i_bpp = [], [], 0.0
        for it in range(3):
            t0 = time.perf_counter()
            bs = i_rt.compress(x_i)
            t1 = time.perf_counter()
            dec = i_rt.decompress(bs, batch=B)
            np.asarray(dec["x_hat"].ravel()[0])
            t2 = time.perf_counter()
            if it:
                i_enc_t.append(t1 - t0)
                i_dec_t.append(t2 - t1)
            i_bpp = bs.num_bytes * 8.0 / (B * H * W)
        i_enc = float(np.median(i_enc_t))
        i_dec = float(np.median(i_dec_t))
        gop_fps = 12.0 / (11.0 / fps_pipe + i_enc + i_dec)
        i_leg = {
            "i_enc_s": round(i_enc, 4),
            "i_dec_s": round(i_dec, 4),
            "i_bpp": round(i_bpp, 4),
            "gop12_fps": round(gop_fps, 4),
            "i_checkpoint": i_ckpt_note,
        }
      except Exception as e:  # leg-local failure must not kill the JSON
        i_leg = {"i_leg_error": f"{type(e).__name__}: {e}"[:200]}

    ref_cpu = reference_cpu_fps()
    out = {
        "metric": "1080p_pframe_encode_decode_fps",
        "batch_streams": B,
        "value": round(fps_pipe, 4),
        "unit": "frames/sec",
        "vs_baseline": round(fps_pipe / ref_cpu, 2) if ref_cpu else None,
        "baseline_ref_cpu_fps": ref_cpu,
        "vs_gpu_class_anchor": round(fps_pipe / GPU_CLASS_ANCHOR_FPS, 4),
        "fps_serial": round(fps_serial, 4),
        "serial_n": len(serial_times),
        "serial_p50_s": round(serial_p50_s, 4),
        "serial_p90_s": round(serial_p90_s, 4),
        "fps_transforms_only": round(fps_transforms, 4),
        "pipelined_mode": pipelined_mode,
        "pipelined_attempts_fps": attempts,
        "pipeline_equality_max_err": max_err,
        "encode_device_s": round(float(np.mean(enc_dev)) * 2, 4),
        "encode_host_rans_s": round(float(np.mean(enc_rans)) * 2, 4),
        "decode_rounds_per_frame": len(dec_rounds) // max(len(serial_times), 1),
        "decode_stall_s_per_frame": round(
            float(np.sum(stalls)) / max(len(serial_times), 1), 4
        ),
        "decode_host_rans_s_per_frame": round(
            float(np.sum(rans)) / max(len(serial_times), 1), 4
        ),
        "encode_transform_tflops": round(flops / 1e12, 3),
        "mfu_vs_357tf": round(mfu, 4),
        "p_checkpoint": ckpt_note,
        # value (pipelined) and fps_serial are both reported because
        # mid-round vs driver-recorded numbers have disagreed (r2: 0.823
        # builder vs 0.722 driver, single measurements on a shared box
        # with no breakdown to compare).  The per-stage terms above exist
        # so any future discrepancy is attributable; medians over frames
        # reduce the noise.
        "note": (
            "r2 0.823-vs-0.722 discrepancy: single measurements on a "
            "shared box with no breakdown; per-stage terms above now "
            "attribute any gap (encode device vs host rANS vs decode "
            "stalls), medians reduce noise"
        ),
        **gop_leg,
        **i_leg,
    }
    print(json.dumps(out))


def main_space(args):
    """Spatial sharding at 1080p on a virtual CPU mesh: correctness +
    halo overhead (VERDICT r2 item 3).  The conv-heavy full-res stages
    (SPyNet motion analysis + motion compensation) are sharded over H;
    XLA's SPMD partitioner inserts the halo exchanges."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", int(args.space))
    import jax.numpy as jnp

    from deepsvc_tpu.models import PFrameCodec, init_pframe_variables
    from deepsvc_tpu.parallel.mesh import make_mesh, replicate, shard_spatial

    model = PFrameCodec()  # f32 on CPU for exact comparisons
    variables = init_pframe_variables(model, jax.random.PRNGKey(0), H=128, W=128)
    mesh = make_mesh(data=1, space=int(args.space))

    frames_np = synthetic_frames(2, H, W)
    ref = jnp.asarray(frames_np[0])[None]
    curr = jnp.asarray(frames_np[1])[None]
    sm = jnp.zeros((1, H // 4, W // 4, 256), jnp.float32)
    mt = type(model)

    motion = jax.jit(lambda v, a, b: model.apply(v, a, b, method=mt.motion_analysis))
    mc_fn = jax.jit(
        lambda v, a, mv1, s, f: model.apply(v, a, mv1, s, f, method=mt.mc_stage)
    )

    # unsharded reference result + time
    mv_in = motion(variables, ref, curr)
    jax.block_until_ready(mv_in)
    t0 = time.perf_counter()
    mv_in = motion(variables, ref, curr)
    jax.block_until_ready(mv_in)
    t_unsharded = time.perf_counter() - t0
    mv = mv_in[..., 3:5]  # (curr, mv, ref) packing: flow channels
    mc = mc_fn(variables, ref, mv, sm, None)
    jax.block_until_ready(mc)
    t0 = time.perf_counter()
    mc = mc_fn(variables, ref, mv, sm, None)
    jax.block_until_ready(mc)
    t_unsharded += time.perf_counter() - t0

    # sharded: H split over `space`; params replicated
    v_s = replicate(variables, mesh)
    ref_s = shard_spatial(ref, mesh)
    curr_s = shard_spatial(curr, mesh)
    sm_s = shard_spatial(sm, mesh)
    mv_in_s = motion(v_s, ref_s, curr_s)
    jax.block_until_ready(mv_in_s)
    t0 = time.perf_counter()
    mv_in_s = motion(v_s, ref_s, curr_s)
    jax.block_until_ready(mv_in_s)
    t_sharded = time.perf_counter() - t0
    mv_s = mv_in_s[..., 3:5]
    mc_s = mc_fn(v_s, ref_s, shard_spatial(mv_s, mesh), sm_s, None)
    jax.block_until_ready(mc_s)
    t0 = time.perf_counter()
    mc_s = mc_fn(v_s, ref_s, shard_spatial(mv_s, mesh), sm_s, None)
    jax.block_until_ready(mc_s)
    t_sharded += time.perf_counter() - t0

    err_mv = float(jnp.abs(mv_in_s - mv_in).max())
    err_mc = float(jnp.abs(mc_s["predict_frame"] - mc["predict_frame"]).max())
    assert err_mv < 1e-4 and err_mc < 1e-4, (err_mv, err_mc)

    rows_per_dev = H // int(args.space)
    out = {
        "metric": "1080p_spatial_sharding",
        "space": int(args.space),
        "resolution": f"{H}x{W}",
        "equal_max_err_motion": err_mv,
        "equal_max_err_mc": err_mc,
        "t_unsharded_s": round(t_unsharded, 3),
        "t_sharded_s": round(t_sharded, 3),
        # halo rows per boundary for the 7x7 SPyNet convs = 3 each side;
        # fraction of per-device rows that are halo recompute/exchange
        "rows_per_device": rows_per_dev,
        "halo_fraction_7x7": round(6.0 / rows_per_dev, 4),
        "note": "virtual CPU mesh: equality + halo accounting, not speed "
                "(single real chip; SURVEY.md 2.6)",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--gop", type=int, default=4,
                   help="gop_pipeline decode-batch size: frames whose "
                        "entropy chains ride one host pull per round")
    p.add_argument("--batch", type=int, default=1,
                   help="N independent streams on one batch axis: aggregate "
                        "serving throughput (per-stream latency rises)")
    p.add_argument("--space", type=int, default=0,
                   help="run the spatial-sharding CPU-mesh bench instead")
    p.add_argument("--ckpt-root", type=str, default="output/rd_round6",
                   help="load trained P/I checkpoints from this root when "
                        "present (mse_640 + image_mse_640 layout)")
    p.add_argument("--fast", action="store_true",
                   help="bench the fast serving profile (half-res flow "
                        "base + MC fusion); point --ckpt-root at a "
                        "matching fast-profile training root")
    p.add_argument("--schedule", type=str, default=None,
                   choices=["gop_pipeline", "decode_thread", "lookahead",
                            "no_lookahead"],
                   help="force one pipelined schedule (A/B sweeps)")
    p.add_argument("--no-iframe", action="store_true")
    p.add_argument("--smoke", action="store_true",
                   help="tiny model at 128x128 on CPU: code-path check only")
    args = p.parse_args()
    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
        TINY = True
        H, W = 128, 128
        args.no_iframe = True
    if args.space:
        main_space(args)
        sys.exit(0)
    main_tpu(args)
