"""Multi-chip sharding tests on the virtual 8-device CPU mesh:
the strip axis shards with shard_map and decodes exactly
(SURVEY.md §5: strips/tiles/frames become sharded batch axes)."""

import numpy as np
import pytest


@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_strip_decode(n_devices):
    import jax

    if len(jax.devices()) < n_devices:
        pytest.skip(f"need {n_devices} devices")
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    ge.dryrun_multichip(n_devices)  # raises on any mismatch


def test_entry_compiles_and_runs():
    import jax
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 4
    assert out.dtype == np.uint16
