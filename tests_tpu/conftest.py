"""Native-kernel test tier: runs the compiled Pallas paths on real TPU.

The CPU suite (tests/) exercises every kernel under the Pallas
*interpreter*, which cannot catch layout/DMA/SMEM bugs — the class of
failure the round-2 OOB SMEM read and the round-3 stream_emit worker
crash belonged to. This tier is the rebuild's analog of the reference
suite running on PoCL (the same compiler/runtime as production,
/root/reference/tests/conftest.py:4-12): identical parity/contract
assertions, `kernel_mode="native"`, real hardware.

Run manually on a TPU host:  python -m pytest tests_tpu -q
(Every test skips cleanly when no TPU backend is available, so the
file is safe under the CPU suite runner too.)
"""

import jax
import pytest


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() != "tpu":
        skip = pytest.mark.skip(reason="native-kernel tier needs a TPU")
        for item in items:
            item.add_marker(skip)
