"""Round-2 on-chip experiment battery: run once after kernel changes.

    python scripts/r2_experiments.py [step...]

Steps (default: all):
  parity   - fused batched encode vs host oracle bytes (matmul-scheme check)
  kernel   - sample_vlc_pack kernel timing at tile 512 vs 1024
  trace420 - per-op device table for the 420 batched encode
  trace444 - per-op device table for the 444 batched encode
"""

import glob
import os
import sys
import time
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_rgb(w, h, seed=42):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([xx * 255 // (w - 1), yy * 255 // (h - 1),
                    (xx + yy) // 2 % 256], -1).astype(np.int64)
    return np.clip(img + rng.randint(-20, 20, img.shape), 0,
                   255).astype(np.uint8)


def _force(r):
    import jax
    np.asarray(jax.tree.leaves(r)[-1].ravel()[:1])


def timeit(fn, reps=6):
    _force(fn())
    t0 = time.perf_counter()
    r = None
    for _ in range(reps):
        r = fn()
    _force(r)
    return (time.perf_counter() - t0) / reps


def step_parity():
    """Fused device encode must stay byte-identical to the host oracle
    after the matmul-scheme change (bf16 hi/lo passes; folded perms)."""
    from sjpeg_tpu import constants as C
    from sjpeg_tpu import host_encoder
    from sjpeg_tpu.engine import encode_batch
    from sjpeg_tpu.params import EncoderParam

    rgb = make_rgb(168, 120)
    batch = np.stack([rgb, rgb[:, :, ::-1].copy(), 255 - rgb])
    for mode, m4 in ((C.YUV_420, False), (C.YUV_444, False),
                     (C.YUV_400, False), (C.YUV_420, True)):
        p = EncoderParam(quality=75, huffman_compress=m4,
                         adaptive_quantization=m4, yuv_mode=mode)
        got = encode_batch(batch, p)
        for i in range(batch.shape[0]):
            want = host_encoder.encode_rgb(batch[i], p)
            assert got[i] == want, (mode, m4, i)
        print(f"parity ok: mode={mode} m4={m4}")


def _kernel_inputs(size=1024, batch=16):
    import jax
    import jax.numpy as jnp
    from sjpeg_tpu import constants as C
    from sjpeg_tpu import spec
    from sjpeg_tpu.engine import (_default_luts_cached,
                                  _interleave_samples,
                                  _quant_device_arrays)
    from sjpeg_tpu.ops import colorspace
    from sjpeg_tpu.params import EncoderParam

    rgb = make_rgb(size, size)
    dev = jax.device_put(np.broadcast_to(rgb, (batch, size, size, 3)).copy())
    param = EncoderParam(quality=75, huffman_compress=False,
                         adaptive_quantization=False)
    qmats = param.resolved_quant_matrices()
    minq = param.resolved_min_quant_matrices()
    qms = [spec.finalize_quant_matrix(qmats[i], minq[i],
                                      param.quantization_bias)
           for i in range(2)]
    iq, ib = _quant_device_arrays(qms)
    dc_luts, ac_luts = _default_luts_cached()

    @jax.jit
    def prep(x):
        blocks = colorspace.rgb_to_blocks(x, C.YUV_420, size, size)
        return _interleave_samples(blocks, iq, ib, (4, 1, 1), batch)

    sinter, dc_codes, group = jax.block_until_ready(prep(dev))
    _force((sinter,))
    return sinter, dc_codes, group, iq, ib, dc_luts, ac_luts


def step_kernel():
    from sjpeg_tpu.ops import pallas_quant_pack as pqp

    sinter, dc_codes, group, iq, ib, dcl, acl = _kernel_inputs()
    n = sinter.shape[0]
    for tile in (512, 1024):
        try:
            fn = lambda: pqp.sample_vlc_pack_pallas(
                sinter, dc_codes, group, iq, ib, dcl, acl, tile=tile)
            dt = timeit(fn)
            steps = n // tile
            print(f"kernel tile={tile}: {dt*1e3:7.2f} ms "
                  f"({dt/steps*1e6:5.1f} us/step, {steps} steps)")
        except Exception as e:
            print(f"kernel tile={tile}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")


def _trace(mode_name, yuv_mode, nb_blocks):
    import jax
    from sjpeg_tpu import spec
    from sjpeg_tpu.engine import (_default_luts_cached,
                                  _quant_device_arrays, encode_batch_core)
    from sjpeg_tpu.params import EncoderParam

    size, batch = 1024, 16
    rgb = make_rgb(size, size)
    dev = jax.device_put(np.broadcast_to(rgb, (batch, size, size, 3)).copy())
    param = EncoderParam(quality=75, huffman_compress=False,
                         adaptive_quantization=False, yuv_mode=yuv_mode)
    qmats = param.resolved_quant_matrices()
    minq = param.resolved_min_quant_matrices()
    qms = [spec.finalize_quant_matrix(qmats[i], minq[i],
                                      param.quantization_bias)
           for i in range(2)]
    iq, ib = _quant_device_arrays(qms)
    dc_luts, ac_luts = _default_luts_cached()
    bucket = max(4096, int(size * size * 4.0 / 32))
    run = lambda: encode_batch_core(dev, iq, ib, dc_luts, ac_luts,
                                    yuv_mode=yuv_mode, width=size,
                                    height=size, nb_blocks=nb_blocks,
                                    bucket=bucket)
    _force(run())
    dt = timeit(run)
    px = batch * size * size
    print(f"{mode_name}: {dt*1e3:.1f} ms/batch = {px/dt/1e6:.1f} Mpx/s")

    tdir = f"/tmp/r2trace_{mode_name}"
    os.system(f"rm -rf {tdir}")
    jax.profiler.start_trace(tdir)
    r = run()
    _force(r)
    jax.profiler.stop_trace()
    files = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    if not files:
        print("  (no xplane captured)")
        return
    pd = jax.profiler.ProfileData.from_file(files[0])
    agg = defaultdict(float)
    for plane in pd.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                agg[ev.name] += ev.duration_ns / 1e6
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:18]:
        print(f"  {ms:8.2f} ms  {name[:100]}")


def main():
    steps = sys.argv[1:] or ["parity", "kernel", "trace420", "trace444"]
    from sjpeg_tpu import constants as C
    for s in steps:
        print(f"==== {s} ====", flush=True)
        if s == "parity":
            step_parity()
        elif s == "kernel":
            step_kernel()
        elif s == "trace420":
            _trace("420", C.YUV_420, (4, 1, 1))
        elif s == "trace444":
            _trace("444", C.YUV_444, (1, 1, 1))


if __name__ == "__main__":
    main()
