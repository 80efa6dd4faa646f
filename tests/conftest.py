import os
import sys

# Virtual 8-device CPU mesh for multi-chip tests.  NOTE: with the axon TPU
# plugin present, the JAX_PLATFORMS env var alone is ignored — the
# jax_platforms config update below is what actually forces CPU.
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8 "
                      + os.environ.get("XLA_FLAGS", ""))
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:  # pragma: no cover
    pass

import pytest  # noqa: E402

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


@pytest.fixture(scope="session")
def data_dir():
    return DATA


@pytest.fixture(scope="session")
def indexed(tmp_path_factory):
    """Build refset + k13/s4 index over the bundled genome once."""
    from smalt_tpu.seq.refset import RefSet
    from smalt_tpu.index.table import build_index

    refset = RefSet.from_fasta(os.path.join(DATA, "genome.fa"))
    idx = build_index(refset, 13, 4)
    return refset, idx
