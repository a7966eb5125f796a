"""Ad-hoc parity check: device trellis vs host oracle (CPU jit)."""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.pop("PYTHONPATH", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from sjpeg_tpu import constants as C
from sjpeg_tpu import spec
from sjpeg_tpu.huffman import build_code_lut, k3_default_tables
from sjpeg_tpu.ops import trellis as dtr
from sjpeg_tpu.params import EncoderParam


def main():
    rng = np.random.RandomState(11)
    defaults = k3_default_tables()
    luts = [build_code_lut(defaults[2], 256), build_code_lut(defaults[3], 256)]
    lens = np.stack([l & 0xFF for l in luts]).astype(np.int32)  # [2, 256]

    for quality in (25, 75, 92):
        param = EncoderParam(quality=quality)
        qmats = param.resolved_quant_matrices()
        minq = param.resolved_min_quant_matrices()
        qms = [spec.finalize_quant_matrix(qmats[g], minq[g],
                                          param.quantization_bias)
               for g in range(2)]

        N = 256
        # realistic-ish coeff magnitudes: mostly small, some large, x16 scale
        coeffs = (rng.randint(-40, 40, (N, 64))
                  * rng.choice([0, 1, 1, 1, 16, 64], (N, 64))).astype(np.int32)
        coeffs[:8] = rng.randint(-16384, 16384, (8, 64))
        coeffs[8:12] = 0
        group = (rng.randint(0, 2, N)).astype(np.int32)

        want = np.empty((N, 64), np.int32)
        t0 = time.time()
        for n in range(N):
            g = int(group[n])
            want[n] = spec.trellis_quantize_block(coeffs[n], qms[g],
                                                  qms[g]["quant"], luts[g])
        t_oracle = time.time() - t0

        iq = np.where(group[:, None] == 0, qms[0]["iquant"][None],
                      qms[1]["iquant"][None]).astype(np.int32)
        ib = np.where(group[:, None] == 0, qms[0]["bias"][None],
                      qms[1]["bias"][None]).astype(np.int32)
        qq = np.where(group[:, None] == 0, qms[0]["quant"][None],
                      qms[1]["quant"][None]).astype(np.int32)
        lt = dtr.ac_len_table(jnp.asarray(lens), jnp.asarray(group))
        t0 = time.time()
        got = np.asarray(dtr.trellis_quantize_blocks_jax(
            jnp.asarray(coeffs), jnp.asarray(iq), jnp.asarray(ib),
            jnp.asarray(qq), lt))
        t_dev = time.time() - t0

        bad = np.nonzero((got != want).any(axis=1))[0]
        print(f"q={quality}: mismatched blocks {len(bad)}/{N} "
              f"(oracle {t_oracle:.2f}s, jax {t_dev:.2f}s)")
        if len(bad):
            n = int(bad[0])
            print(" block", n, "group", int(group[n]))
            print(" coeff:", coeffs[n][:16])
            print(" want :", want[n][:16])
            print(" got  :", got[n][:16])
            dz = np.nonzero(got[n] != want[n])[0]
            print(" diff rasters:", dz, "want", want[n][dz], "got", got[n][dz])
            sys.exit(1)
    print("OK")


if __name__ == "__main__":
    main()
