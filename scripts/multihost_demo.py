"""Multi-host sharded encode: launcher + worker.

Demonstrates and validates the dp (data-parallel, across-process/DCN) axis
of `sjpeg_tpu.parallel.api.encode_batch_sharded` (SURVEY §5.8).  The
reference is single-process (src/enc.cc has no threads); this launch
protocol is the TPU-native scale-out: each host feeds its local images,
stripe collectives ride sp/ICI, and no image data ever crosses the dp
axis.

Default (launcher) mode simulates N hosts on one machine with the CPU
backend (`--xla_force_host_platform_device_count` per process), spawning
N workers wired to a local coordinator, then checks every produced JPEG
byte-for-byte against the serial per-image encoder.  On a real TPU pod,
run one worker per host with --coordinator/--nproc/--pid set (or rely on
pod auto-discovery by passing --auto).

Usage:
  python scripts/multihost_demo.py                   # 2x2 CPU simulation
  python scripts/multihost_demo.py --nproc 2 --local-devices 4 \
      --batch 4 --height 64 --width 48 --method 4
  python scripts/multihost_demo.py --worker --pid 0 --nproc 2 ...  # internal
"""

import argparse
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def make_image(pid: int, j: int, h: int, w: int):
    import numpy as np
    rng = np.random.RandomState(1000 * pid + j)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([xx * 255 // max(w - 1, 1), yy * 255 // max(h - 1, 1),
                    (xx + yy) // 2 % 256], -1).astype(np.int64)
    img = np.clip(img + rng.randint(-25, 25, img.shape), 0, 255)
    return img.astype(np.uint8)


def run_worker(args):
    sys.path.insert(0, str(REPO))
    import numpy as np
    import jax
    from sjpeg_tpu import constants as C
    from sjpeg_tpu.params import EncoderParam
    from sjpeg_tpu.parallel.mesh import init_distributed, make_mesh
    from sjpeg_tpu.parallel.api import encode_batch_sharded

    if args.auto:
        init_distributed()          # TPU pods auto-discover
    else:
        init_distributed(coordinator_address=args.coordinator,
                         num_processes=args.nproc, process_id=args.pid)
    pid = jax.process_index()
    mesh = (make_mesh(dp=args.dp) if args.dp
            else make_mesh())       # dp = processes, sp = local devices
    imgs = np.stack([make_image(pid, j, args.height, args.width)
                     for j in range(args.batch)])
    param = EncoderParam(quality=args.quality, yuv_mode=C.YUV_420,
                         huffman_compress=args.method >= 1,
                         adaptive_quantization=args.method >= 3)
    if args.target_size:
        param.set_target_size(args.target_size, passes=args.passes)
    jpegs = encode_batch_sharded(imgs, param, mesh=mesh)
    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    for j, data in enumerate(jpegs):
        (outdir / f"p{pid}_{j}.jpg").write_bytes(data)
    print(f"[worker {pid}] wrote {len(jpegs)} JPEGs "
          f"(mesh dp={mesh.shape['dp']} sp={mesh.shape['sp']})", flush=True)


def run_launcher(args):
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("PYTHONPATH", "PALLAS_AXON_POOL_IPS",
                             "PALLAS_AXON_REMOTE_COMPILE", "JAX_PLATFORMS")}
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["PYTHONPATH"] = str(REPO)
    env_base["XLA_FLAGS"] = (env_base.get("XLA_FLAGS", "") +
                             f" --xla_force_host_platform_device_count="
                             f"{args.local_devices}").strip()
    coord = f"127.0.0.1:{args.port}"
    procs = []
    for pid in range(args.nproc):
        cmd = [sys.executable, __file__, "--worker", "--pid", str(pid),
               "--nproc", str(args.nproc), "--coordinator", coord,
               "--outdir", args.outdir, "--batch", str(args.batch),
               "--height", str(args.height), "--width", str(args.width),
               "--method", str(args.method), "--quality",
               str(args.quality), "--target-size",
               str(args.target_size), "--passes", str(args.passes),
               "--dp", str(args.dp)]
        procs.append(subprocess.Popen(cmd, env=env_base, cwd=REPO))
    rc = 0
    for p in procs:
        rc |= p.wait()
    if rc:
        sys.exit(rc)

    # verify: every worker's JPEGs must equal the serial encoder's bytes
    os.environ.clear()
    os.environ.update(env_base)
    sys.path.insert(0, str(REPO))
    import numpy as np
    from sjpeg_tpu import constants as C
    from sjpeg_tpu.engine import encode_rgb
    from sjpeg_tpu.params import EncoderParam
    param = EncoderParam(quality=args.quality, yuv_mode=C.YUV_420,
                         huffman_compress=args.method >= 1,
                         adaptive_quantization=args.method >= 3)
    if args.target_size:
        param.set_target_size(args.target_size, passes=args.passes)
    n_ok = 0
    for pid in range(args.nproc):
        for j in range(args.batch):
            path = Path(args.outdir) / f"p{pid}_{j}.jpg"
            got = path.read_bytes()
            want = encode_rgb(make_image(pid, j, args.height, args.width),
                              param)
            assert got == want, f"{path} diverges from serial encode"
            n_ok += 1
    print(f"multihost OK: {n_ok} JPEGs byte-identical to serial "
          f"({args.nproc} processes x {args.local_devices} devices, "
          f"method {args.method})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--auto", action="store_true",
                    help="pod auto-discovery (real multi-host)")
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--coordinator", default="127.0.0.1:19876")
    ap.add_argument("--port", type=int, default=19876)
    ap.add_argument("--outdir", default="/tmp/sjpeg_multihost")
    ap.add_argument("--batch", type=int, default=2,
                    help="images per process")
    ap.add_argument("--height", type=int, default=32)
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--method", type=int, default=4)
    ap.add_argument("--quality", type=int, default=80)
    ap.add_argument("--target-size", type=int, default=0,
                    help="run a target-size dichotomy (bytes)")
    ap.add_argument("--passes", type=int, default=4)
    ap.add_argument("--dp", type=int, default=0,
                    help="override mesh dp (0 = one per process)")
    args = ap.parse_args()
    if args.worker:
        run_worker(args)
    else:
        run_launcher(args)


if __name__ == "__main__":
    main()
