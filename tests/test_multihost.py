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


class TestTwoProcessDistributed:
    """The strongest DCN-path evidence available without a pod (SURVEY §2.16):
    two real jax.distributed processes (local coordinator, 1 CPU device each)
    run the full collect+train chunk over a 2-device data mesh and must
    produce the same loss as one process owning both devices — the global
    SPMD program is topology-invariant."""

    def _run(self, args_list, env):
        worker = os.path.join(os.path.dirname(os.path.abspath(__file__)), "multihost_worker.py")
        procs = [
            subprocess.Popen(
                [sys.executable, worker] + args,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                env=env,
            )
            for args in args_list
        ]
        outs = [p.communicate(timeout=420)[0] for p in procs]
        losses = []
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out[-2000:]
            loss_lines = [l for l in out.splitlines() if l.startswith("LOSS ")]
            assert loss_lines, out[-2000:]
            losses.append(float(loss_lines[-1].split()[1]))
        return losses

    def test_two_process_train_chunk_matches_single_process(self):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # conftest's 8-device forcing must not leak
        env.pop("JAX_PLATFORMS", None)
        port = str(20000 + os.getpid() % 10000)
        (single,) = self._run([["--local_devices", "2"]], env)
        pair = self._run(
            [
                ["--local_devices", "1", "--num_processes", "2", "--process_id", "0", "--port", port],
                ["--local_devices", "1", "--num_processes", "2", "--process_id", "1", "--port", port],
            ],
            env,
        )
        assert pair[0] == pair[1]
        assert abs(pair[0] - single) < 1e-6, (pair, single)
