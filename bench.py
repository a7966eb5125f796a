"""Benchmark: baseline-JPEG encode throughput vs the reference encoder.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpixel/s", "vs_baseline": N, ...}

Headline config (BASELINE.md config 1): 4:2:0, q=75, default Huffman tables,
on a 1024x1024 image batched x16, measured per chip.  `value` is the
steady-state device-program throughput (all compute through the final
per-image bitstream) — the deployment model for a TPU encode service.
`configs` carries BASELINE.md configs 2-5 plus a trellis config, each with
its measured reference-binary rate on this host.

Timing methodology (one source of truth — README/BASELINE quote these):
- Device rates use SLOPE timing: queue R dispatches + one forcing fetch,
  then 2R + one fetch; (t_2R - t_R)/R is pure steady-state execution with
  the fixed fetch cost cancelled exactly.  This matters because the dev
  harness reaches the chip through a tunnel whose per-fetch RPC costs
  35-90 ms; a real deployment's co-located host pays microseconds.  The
  median of 3 trials is reported with the min-max spread.
- e2e rates are plain wall clock per `encode_batch` call, including the
  tunnel stream fetch + host assembly every batch — the lower bound.
- The reference binary's own `elapsed` timer, min over 10 runs (its best
  case; it excludes image decode and file I/O, like our device rates).
"""

import io
import json
import os
import subprocess
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

REPO = Path(__file__).resolve().parent
REFERENCE_SRC = Path("/root/reference")
REFERENCE_BUILD = Path("/root/build-ref")

SIZE = 1024
BATCH = 16


def make_image(w, h, seed=42):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([xx * 255 // max(w - 1, 1), yy * 255 // max(h - 1, 1),
                    (xx + yy) // 2 % 256], -1).astype(np.int64)
    img = np.clip(img + rng.randint(-20, 20, img.shape), 0, 255)
    return img.astype(np.uint8)


def _ensure_reference():
    bin_ = REFERENCE_BUILD / "sjpeg"
    if not bin_.exists():
        if not REFERENCE_SRC.exists():
            return None
        REFERENCE_BUILD.mkdir(parents=True, exist_ok=True)
        try:
            subprocess.run(["cmake", str(REFERENCE_SRC),
                            "-DCMAKE_BUILD_TYPE=Release"],
                           cwd=REFERENCE_BUILD, check=True,
                           capture_output=True)
            subprocess.run(["make", "-j8", "sjpeg-bin"],
                           cwd=REFERENCE_BUILD, check=True,
                           capture_output=True)
        except Exception:
            return None
    return bin_


def reference_mpps(rgb, flags, src_path=None):
    """Reference encoder throughput (its own 'elapsed' timer), Mpixel/s."""
    bin_ = _ensure_reference()
    if bin_ is None:
        return None
    if src_path is None:
        src_path = "/tmp/bench_in.ppm"
        with open(src_path, "wb") as f:
            f.write(f"P6\n{rgb.shape[1]} {rgb.shape[0]}\n255\n".encode())
            f.write(rgb.tobytes())
    times = []
    for _ in range(10):
        out = subprocess.run(
            [str(bin_), str(src_path), "-o", "/tmp/bench_ref.jpg",
             *flags], capture_output=True, text=True, check=True)
        for line in out.stdout.splitlines():
            if "elapsed" in line:
                ms = float(line.split(":")[1].strip().split()[0])
                times.append(max(ms, 0.5) / 1e3)
    if not times:
        return None
    dt = min(times)
    return rgb.shape[0] * rgb.shape[1] / dt / 1e6


def _force(r):
    """Force execution through the relay backend: block_until_ready alone
    does not flush deferred relay programs, so fetch one element of the
    last leaf (the small totals array)."""
    import jax
    np.asarray(jax.tree.leaves(r)[-1].ravel()[:1])


def slope_time(run, reps=8, trials=3):
    """Steady-state seconds per call: queue R dispatches + one forcing
    fetch, then 2R + one fetch; the difference is R pure executions (the
    fixed fetch/dispatch cost cancels).  Returns (median, spread) over
    `trials`."""
    _force(run())                       # compile + warm
    est = []
    for _ in range(trials):
        t0 = time.perf_counter()
        r = None
        for _ in range(reps):
            r = run()
        _force(r)
        t_r = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(2 * reps):
            r = run()
        _force(r)
        t_2r = time.perf_counter() - t0
        est.append((t_2r - t_r) / reps)
    est.sort()
    return est[len(est) // 2], est[-1] - est[0]


def sustained_rate(rgb, param, k=6, depth=4):
    """Steady-state Mpx/s through engine.encode_pipelined: k distinct
    pre-uploaded batches, `depth` in flight, so one batch's result fetch
    + host assembly overlaps the next batch's device work.  depth=4
    measured best through the dev tunnel (per-RPC latency needs several
    batches in flight to hide; a co-located host saturates at 2)."""
    import jax
    from sjpeg_tpu.engine import encode_batch, encode_pipelined
    h, w = rgb.shape[:2]
    devs = []
    for i in range(k):
        r = np.roll(rgb, 17 * i, axis=0)
        devs.append(jax.device_put(
            np.broadcast_to(r, (BATCH, h, w, 3)).copy()))
    for d in devs:          # warm every distinct batch: stream lengths
        encode_batch(d, param)  # differ, so fetch/compact slice shapes
    t0 = time.perf_counter()    # (ladder-quantized) can each compile once
    for _ in encode_pipelined(iter(devs), param, depth=depth):
        pass
    dt = time.perf_counter() - t0
    return _rate(BATCH * w * h * k, dt)


def wall_time(fn, reps=4):
    """Plain per-call wall clock (for host-inclusive e2e paths)."""
    fn()                                # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def _std_qms(param):
    from sjpeg_tpu import spec
    qmats = param.resolved_quant_matrices()
    minq = param.resolved_min_quant_matrices()
    return [spec.finalize_quant_matrix(qmats[i], minq[i],
                                       param.quantization_bias)
            for i in range(2)]


def _rate(px, dt):
    return round(px / dt / 1e6, 1)


def config1(rgb):
    """4:2:0 q75 fixed tables: device rate + e2e (with a measured
    device / tunnel-fetch / host-assembly breakdown) + PSNR/size."""
    import jax
    from sjpeg_tpu import constants as C, pipeline
    from sjpeg_tpu import engine
    from sjpeg_tpu.engine import (_default_luts_cached, _quant_device_arrays,
                                  encode_batch, encode_batch_core)
    from sjpeg_tpu.huffman import k3_default_tables
    from sjpeg_tpu.params import EncoderParam

    h, w = rgb.shape[:2]
    px = BATCH * w * h
    param = EncoderParam(quality=75, huffman_compress=False,
                         adaptive_quantization=False, yuv_mode=C.YUV_420)
    dev = jax.device_put(np.broadcast_to(rgb, (BATCH, h, w, 3)).copy())

    jpegs = encode_batch(dev, param)             # warm + artifact
    dt_e2e = wall_time(lambda: encode_batch(dev, param))
    sus = sustained_rate(rgb, param)

    qms = _std_qms(param)
    iq, ib = _quant_device_arrays(qms)
    dc_luts, ac_luts = _default_luts_cached()
    bucket = max(4096, int(w * h * 4.0 / 32))
    run = lambda: encode_batch_core(dev, iq, ib, dc_luts, ac_luts,
                                    yuv_mode=C.YUV_420, width=w, height=h,
                                    nb_blocks=(4, 1, 1), bucket=bucket)
    dt_dev, spread = slope_time(run)

    # e2e decomposition: fetch (tunnel) and host stuffing/marker splice
    words, totals = run()
    totals_np = np.asarray(totals)
    t0 = time.perf_counter()
    words_np = engine.fetch_streams_batch(words, totals_np)
    fetch_s = time.perf_counter() - t0
    layout = pipeline.component_layout(C.YUV_420, w, h)
    tables = k3_default_tables()
    t0 = time.perf_counter()
    for i in range(BATCH):
        scan = engine._finalize_scan_bytes(words_np[i], int(totals_np[i]))
        engine._assemble_jpeg(layout, param, qms, tables, scan)
    host_s = time.perf_counter() - t0
    breakdown = {
        "device_ms": round(dt_dev * 1e3, 1),
        "tunnel_fetch_ms": round(fetch_s * 1e3, 1),
        "fetched_mb": round(words_np.nbytes / 1e6, 2),
        "host_stuff_assemble_ms": round(host_s * 1e3, 1),
        "sustained_e2e_mpps": sus}
    return (_rate(px, dt_dev), _rate(px, dt_e2e),
            round(abs(_rate(px, dt_dev - spread / 2)
                      - _rate(px, dt_dev + spread / 2)), 1),
            breakdown, jpegs[0])


def config2(rgb, out):
    """4:4:4 q75 fixed tables."""
    import jax
    from sjpeg_tpu import constants as C
    from sjpeg_tpu.engine import (_default_luts_cached, _quant_device_arrays,
                                  encode_batch, encode_batch_core)
    from sjpeg_tpu.params import EncoderParam

    h, w = rgb.shape[:2]
    px = BATCH * w * h
    ref = reference_mpps(rgb, ["-q", "75", "-yuv_mode", "3", "-no_adapt",
                               "-no_optim"])
    param = EncoderParam(quality=75, huffman_compress=False,
                         adaptive_quantization=False, yuv_mode=C.YUV_444)
    dev = jax.device_put(np.broadcast_to(rgb, (BATCH, h, w, 3)).copy())
    jpegs = encode_batch(dev, param)
    verify(jpegs[0], rgb)
    dt_e2e = wall_time(lambda: encode_batch(dev, param))
    iq, ib = _quant_device_arrays(_std_qms(param))
    dc_luts, ac_luts = _default_luts_cached()
    bucket = max(4096, int(w * h * 4.0 / 32))
    run = lambda: encode_batch_core(dev, iq, ib, dc_luts, ac_luts,
                                    yuv_mode=C.YUV_444, width=w, height=h,
                                    nb_blocks=(1, 1, 1), bucket=bucket)
    dt_dev, _ = slope_time(run)
    dev_mpps = _rate(px, dt_dev)
    out["c2_444_q75_m0"] = {
        "device_mpps": dev_mpps, "e2e_mpps": _rate(px, dt_e2e),
        "reference_mpps": round(ref, 1) if ref else None,
        "vs_baseline": round(dev_mpps / ref, 2) if ref else None}


def config3(rgb, out):
    """Method 4 (reference default): adaptive quant + per-image two-pass
    Huffman.  Device rate = the three device programs back-to-back with
    live per-image matrices/LUTs (host lambda-fits and table builds are
    excluded there, included in e2e)."""
    import jax
    import jax.numpy as jnp
    from sjpeg_tpu import constants as C
    from sjpeg_tpu import engine
    from sjpeg_tpu.params import EncoderParam

    h, w = rgb.shape[:2]
    px = BATCH * w * h
    ref = reference_mpps(rgb, ["-q", "75", "-yuv_mode", "1"])
    param = EncoderParam(quality=75, yuv_mode=C.YUV_420)
    dev = jax.device_put(np.broadcast_to(rgb, (BATCH, h, w, 3)).copy())
    jpegs = engine.encode_batch(dev, param)
    verify(jpegs[0], rgb)
    dt_e2e = wall_time(lambda: engine.encode_batch(dev, param))
    entry = {"e2e_mpps": _rate(px, dt_e2e),
             "sustained_e2e_mpps": sustained_rate(rgb, param),
             "reference_mpps": round(ref, 1) if ref else None}

    if engine._relay_backend():
        # capture the live prep/final invocation, then slope-time the two
        # device programs the m4 pipeline dispatches (prep caches samples
        # + coeffs + histos; final = freqs -> device tables -> pack)
        cap = {}
        orig = engine._stage_m4_final

        def spy(*args, **kw):
            cap["args"], cap["kw"] = args, kw
            return orig(*args, **kw)

        engine._stage_m4_final = spy
        try:
            engine.encode_batch(dev, param)
        finally:
            engine._stage_m4_final = orig
        t_h, _ = slope_time(lambda: engine._stage_search_prep(
            dev, yuv_mode=C.YUV_420, width=w, height=h,
            nb_blocks=(4, 1, 1), n_images=BATCH, src_kind="rgb",
            with_histo=True)["coeffs"][0])
        t_p, _ = slope_time(lambda: orig(*cap["args"], **cap["kw"])[0])
        entry["device_mpps"] = _rate(px, t_h + t_p)
        entry["device_ms_breakdown"] = {
            "prep_histograms": round(t_h * 1e3, 2),
            "freqs_tables_pack": round(t_p * 1e3, 2)}
        entry["vs_baseline"] = (round(entry["device_mpps"] / ref, 2)
                                if ref else None)
    elif ref:
        entry["vs_baseline"] = round(entry["e2e_mpps"] / ref, 2)
    out["c3_420_q75_m4"] = entry


def config4(rgb, out):
    """Recompression: JPEG-in -> FindQuantizer -> SetQuantization(r=90) +
    limit re-encode (reference recipe, examples/sjpeg.cc:262-286).  Both
    sides are timed on the encode only (the reference's elapsed timer
    excludes its libjpeg decode)."""
    import jax
    from sjpeg_tpu import constants as C, tools
    from sjpeg_tpu.engine import encode_batch
    from sjpeg_tpu.params import EncoderParam
    from PIL import Image

    h, w = rgb.shape[:2]
    px = BATCH * w * h
    bin_ = _ensure_reference()
    src_jpg = "/tmp/bench_src.jpg"
    with open("/tmp/bench_in.ppm", "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(rgb.tobytes())
    subprocess.run([str(bin_), "/tmp/bench_in.ppm", "-o", src_jpg,
                    "-q", "85", "-quiet"], check=True)
    ref = reference_mpps(rgb, ["-r", "90"], src_path=src_jpg)

    data = open(src_jpg, "rb").read()
    count, mats = tools.find_quantizer(data)
    assert count == 2, count
    dec = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    param = EncoderParam(yuv_mode=C.YUV_420)
    param.set_quantization(np.asarray(mats), 90.0)
    param.set_limit_quantization(True)
    dev = jax.device_put(np.broadcast_to(dec, (BATCH, h, w, 3)).copy())
    jpegs = encode_batch(dev, param)
    verify(jpegs[0], rgb, min_psnr=24.0)
    dt_e2e = wall_time(lambda: encode_batch(dev, param))
    out["c4_recompress_r90"] = {
        "e2e_mpps": _rate(px, dt_e2e),
        "reference_mpps": round(ref, 1) if ref else None,
        "vs_baseline": (round(_rate(px, dt_e2e) / ref, 2) if ref else None)}


def config5(rgb, out):
    """Batched target-size dichotomy (B independent searches; the
    device-resident loop runs every pass in one program, stops exactly
    when the hook converges, and the winning pass's saved stream is the
    output — engine._encode_batch_search / _stage_search_loop_size)."""
    import jax
    from sjpeg_tpu import constants as C
    from sjpeg_tpu import engine
    from sjpeg_tpu.engine import encode_batch
    from sjpeg_tpu.params import EncoderParam

    h, w = rgb.shape[:2]
    px = BATCH * w * h
    target = 100000
    ref = reference_mpps(rgb, ["-size", str(target), "-pass", "6",
                               "-yuv_mode", "1"])
    param = EncoderParam(yuv_mode=C.YUV_420)
    param.set_target_size(target, passes=6)
    dev = jax.device_put(np.broadcast_to(rgb, (BATCH, h, w, 3)).copy())

    # capture the live device-loop invocation so the loop program itself
    # gets a slope-timed row (the proof the device-resident search is
    # engaged and fast, VERDICT r4 item 1)
    cap = {}
    orig = engine._stage_search_loop_size

    def spy(*args, **kw):
        cap["args"], cap["kw"] = args, kw
        return orig(*args, **kw)

    engine._stage_search_loop_size = spy
    try:
        jpegs = encode_batch(dev, param)
    finally:
        engine._stage_search_loop_size = orig
    verify(jpegs[0], rgb, min_psnr=24.0)
    sizes = [len(j) for j in jpegs]
    dt_e2e = wall_time(lambda: encode_batch(dev, param), reps=2)
    sus = sustained_rate(rgb, param, k=4)
    entry = {
        "e2e_mpps": _rate(px, dt_e2e),
        "sustained_e2e_mpps": sus,
        "reference_mpps": round(ref, 1) if ref else None,
        "vs_baseline": (round(sus / ref, 2) if ref else None),
        "target_bytes": target, "result_bytes": sizes[0]}
    if cap:
        t_l, _ = slope_time(
            lambda: orig(*cap["args"], **cap["kw"])[0], reps=2)
        t_p, _ = slope_time(lambda: engine._stage_search_prep(
            dev, yuv_mode=C.YUV_420, width=w, height=h,
            nb_blocks=(4, 1, 1), n_images=BATCH, src_kind="rgb",
            with_histo=True)["coeffs"][0], reps=2)
        entry["search_loop_ms"] = round(t_l * 1e3, 2)
        entry["search_prep_ms"] = round(t_p * 1e3, 2)
    out["c5_dichotomy_size"] = entry


def config6(rgb, out):
    """Trellis (method 7: trellis quant + adaptive + two-pass Huffman).
    Device rate = the four device stages back-to-back with live per-image
    matrices/tables (host lambda-fits and table builds excluded there)."""
    import jax
    import jax.numpy as jnp
    from sjpeg_tpu import constants as C
    from sjpeg_tpu import engine
    from sjpeg_tpu.params import EncoderParam

    h, w = rgb.shape[:2]
    px = BATCH * w * h
    ref = reference_mpps(rgb, ["-q", "75", "-yuv_mode", "1", "-trellis"])
    param = EncoderParam(quality=75, yuv_mode=C.YUV_420, use_trellis=True)
    dev = jax.device_put(np.broadcast_to(rgb, (BATCH, h, w, 3)).copy())
    jpegs = engine.encode_batch(dev, param)
    verify(jpegs[0], rgb)
    dt_e2e = wall_time(lambda: engine.encode_batch(dev, param), reps=2)
    entry = {"e2e_mpps": _rate(px, dt_e2e),
             "sustained_e2e_mpps": sustained_rate(rgb, param, k=4),
             "reference_mpps": round(ref, 1) if ref else None}

    # device-side: coeffs+histos, chunked trellis + stats, final pack
    qms = _std_qms(param)
    iq, ib = engine._quant_device_arrays(qms)
    qq = jnp.asarray(np.stack([qms[0]["quant"],
                               qms[1]["quant"]]).astype(np.int32))
    t_c, _ = slope_time(lambda: engine._stage_batch_coeffs(
        dev, yuv_mode=C.YUV_420, width=w, height=h, with_histo=True,
        n_images=BATCH, src_kind="rgb"), reps=4)
    coeffs, _h = engine._stage_batch_coeffs(
        dev, yuv_mode=C.YUV_420, width=w, height=h, with_histo=False,
        n_images=BATCH, src_kind="rgb")

    def trellis_stage():
        return engine._stage_quantize_trellis(
            coeffs, iq, ib, qq, engine._trellis_cost_lens(),
            with_stats=True, nb_blocks=(4, 1, 1), n_images=BATCH,
            per_image_stats=True)

    t_t, _ = slope_time(trellis_stage, reps=2)
    vlc_state, freqs = trellis_stage()
    from sjpeg_tpu.huffman import optimal_tables_from_freqs
    fdc = np.asarray(freqs[0]).astype(np.int64).reshape(BATCH, 2, 12)
    fac = np.asarray(freqs[1]).astype(np.int64).reshape(BATCH, 2, 256)
    tabs = [optimal_tables_from_freqs(fdc[i], fac[i], 2)
            for i in range(BATCH)]
    dc_np = np.zeros((BATCH, 2, 16), np.uint32)
    ac_np = np.zeros((BATCH, 2, 256), np.uint32)
    for i, t in enumerate(tabs):
        dc_np[i], ac_np[i] = engine._host_luts(t)
    dcl, acl = jax.numpy.asarray(dc_np), jax.numpy.asarray(ac_np)
    bucket = max(4096, int(w * h * 4.0 / 32))
    t_p, _ = slope_time(lambda: engine._stage_batch_pack(
        vlc_state, dcl, acl, n_images=BATCH, bucket=bucket,
        per_image_tables=True), reps=4)
    entry["device_mpps"] = _rate(px, t_c + t_t + t_p)
    entry["device_ms_breakdown"] = {
        "coeffs_histos": round(t_c * 1e3, 2),
        "trellis_quantize_stats": round(t_t * 1e3, 2),
        "final_pack": round(t_p * 1e3, 2)}
    entry["vs_baseline"] = (round(entry["device_mpps"] / ref, 2)
                            if ref else None)
    out["c6_trellis_m7"] = entry


def transport_mbps():
    """Measured host<->device transport bandwidth through the dev relay
    (fresh 8.4 MB device array fetched once; the relay serves a single
    stream — concurrent chunked fetches measure the same or slower).
    Makes the e2e rows interpretable: they include this transport."""
    import jax

    @jax.jit
    def fresh(x, k):
        return x + k

    base = jax.device_put(
        np.random.randint(0, 2 ** 31, (16, 131072)).astype(np.uint32))
    rates = []
    for k in range(3):
        y = fresh(base, np.uint32(k + 1))
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        np.asarray(y)
        rates.append(y.nbytes / 1e6 / (time.perf_counter() - t0))
    return round(float(np.median(rates)), 1)


def verify(jpeg, rgb, min_psnr=25.0):
    """The produced stream must decode and match the source closely."""
    from PIL import Image
    dec = np.asarray(Image.open(io.BytesIO(jpeg)).convert("RGB"))
    assert dec.shape == rgb.shape
    mse = np.mean((dec.astype(np.float64) - rgb) ** 2)
    psnr = 10 * np.log10(255 ** 2 / mse)
    assert psnr > min_psnr, f"PSNR {psnr:.1f} too low"
    return psnr


def main():
    # 1024x1024: large enough that the reference's integer-ms encode timer
    # has <7% granularity (512x512 encodes in 1-2 ms and quantizes to 2x)
    rgb = make_image(SIZE, SIZE)
    ref = reference_mpps(rgb, ["-q", "75", "-yuv_mode", "1", "-no_adapt",
                               "-no_optim"])
    dev_mpps, e2e_mpps, spread_mpps, breakdown, jpeg = config1(rgb)
    psnr = verify(jpeg, rgb)
    result = {
        "metric": "baseline 4:2:0 q75 default-Huffman encode, 1024x1024 "
                  "x16 batch, Mpixel/s per chip",
        "value": dev_mpps,
        "unit": "Mpixel/s",
        "vs_baseline": round(dev_mpps / ref, 2) if ref else None,
        "timing": {"method": "slope: (t_2R - t_R)/R over queued dispatches,"
                             " R=8, median of 3 trials",
                   "spread_mpps": spread_mpps},
        "batched_e2e_mpps": e2e_mpps,
        "sustained_e2e_mpps": breakdown.pop("sustained_e2e_mpps"),
        "e2e_breakdown": breakdown,
        "reference_mpps": round(ref, 1) if ref else None,
        "psnr_db": round(psnr, 2),
        "jpeg_bytes": len(jpeg),
        "transport_mbps": transport_mbps(),
    }
    configs = {}
    for fn in (config2, config3, config4, config5, config6):
        try:                            # never lose the headline number
            fn(rgb, configs)
        except Exception as e:
            configs[fn.__name__ + "_error"] = repr(e)
    result["configs"] = configs
    print(json.dumps(result))


if __name__ == "__main__":
    main()
