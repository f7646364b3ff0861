"""Multi-host entry plumbing (parallel/mesh.py:initialize_multihost and the
pre-import guard in train/selfplay.py). The real DCN path needs a pod; these
tests pin the contracts that make it work: flag detection in both argv forms,
and the package import staying XLA-backend-free so
jax.distributed.initialize() can still run after the import."""

import os
import subprocess
import sys

from hanabi_sad_tpu.train.selfplay import _multihost_requested


class TestFlagParsing:
    def test_space_form(self):
        assert _multihost_requested(["prog", "--multihost", "1"])
        assert not _multihost_requested(["prog", "--multihost", "0"])
        assert _multihost_requested(["prog", "--multihost"])  # bare flag

    def test_equals_form(self):
        assert _multihost_requested(["prog", "--multihost=1"])
        assert not _multihost_requested(["prog", "--multihost=0"])

    def test_absent(self):
        assert not _multihost_requested(["prog", "--preset", "dev"])


class TestBackendFreeImport:
    def test_package_import_does_not_init_backend(self):
        """Importing the full trainer must not initialize the XLA backend
        (a module-level jnp computation anywhere in the import graph would;
        see replay/bitpack.py _powers)."""
        code = (
            "from jax._src import xla_bridge as xb\n"
            "import hanabi_sad_tpu.train.selfplay\n"
            "assert not xb._backends, 'import initialized the XLA backend'\n"
            "print('backend-free')\n"
        )
        env = dict(os.environ)
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=120,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert out.returncode == 0, out.stderr
        assert "backend-free" in out.stdout
