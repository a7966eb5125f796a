"""Early pytest bootstrap: scrub the accelerator-plugin environment.

Loaded via `-p sjpeg_test_bootstrap` (see pytest.ini) at option-preparse
time, *before* pytest starts fd capture, so the re-exec below keeps stdout
attached to the caller.

Why: the ambient environment may pin JAX to a remote TPU plugin (registered
by a sitecustomize hook at interpreter startup) that routes every XLA
compile through a slow remote service — including CPU compiles — and blocks
whenever the device is busy.  Tests run on a virtual 8-device CPU mesh, so
we re-exec once with the plugin environment removed.  Set SJPEG_TEST_TPU=1
to skip the scrub and run tests against real hardware.
"""

import os
import sys

if (not os.environ.get("SJPEG_TEST_TPU")
        and os.environ.get("PALLAS_AXON_POOL_IPS")
        and not os.environ.get("_SJPEG_TEST_REEXEC")):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["_SJPEG_TEST_REEXEC"] = "1"
    os.execve(sys.executable, list(sys.orig_argv), env)
