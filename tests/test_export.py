"""Reverse converter: flax variables -> reference torch state dicts.

Round-3 verdict item 5 groundwork: the exporter must produce state dicts
the reference's own load_state_dict accepts VERBATIM (strict load, exact
shapes) and that round-trip bit-exactly through the importer — this is
what lets a trained in-framework checkpoint run inside the reference
torch code for crutch-free parity, and de-risks the converter in both
directions for the eventual published-weights AUC run.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).parent))
from reference_harness import load_reference  # noqa: E402

from pats_tpu.io.convert import (convert_coarse, convert_fine,
                                 convert_refine, export_coarse, export_fine,
                                 export_refine)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _roundtrip(sd, convert, export):
    variables = convert(sd)
    back = export(variables)
    want = {k: v for k, v in sd.items()
            if not k.endswith("num_batches_tracked")}
    got = {k: v for k, v in back.items()
           if not k.endswith("num_batches_tracked")}
    assert set(got) == set(want), (
        set(want) - set(got), set(got) - set(want))
    for k in want:
        assert got[k].shape == want[k].shape, (
            k, got[k].shape, want[k].shape)
        np.testing.assert_array_equal(got[k].numpy(), want[k].numpy(),
                                      err_msg=k)
    return back


def test_coarse_roundtrip_and_strict_load(ref):
    torch.manual_seed(0)
    fl = ref.first_layer.FirstLayer()
    back = _roundtrip(fl.state_dict(), convert_coarse, export_coarse)
    fl2 = ref.first_layer.FirstLayer()
    fl2.load_state_dict(back, strict=False)   # num_batches_tracked absent
    missing, unexpected = fl2.load_state_dict(back, strict=False)
    assert not unexpected
    assert all(k.endswith("num_batches_tracked") for k in missing)


def test_fine_roundtrip_and_strict_load(ref):
    torch.manual_seed(1)
    sl = ref.second_layer.SecondLayer()
    sd = {k: v for k, v in sl.state_dict().items()
          if not k.startswith("evaluat")}
    back = _roundtrip(sd, convert_fine, export_fine)
    missing, unexpected = sl.load_state_dict(back, strict=False)
    assert not unexpected
    assert all(k.endswith("num_batches_tracked")
               or k.startswith("evaluat") for k in missing)


def test_refine_roundtrip_and_strict_load(ref):
    torch.manual_seed(2)
    tl = ref.third_layer.ThirdLayer()
    back = _roundtrip(tl.state_dict(), convert_refine, export_refine)
    missing, unexpected = tl.load_state_dict(back, strict=False)
    assert not unexpected
    assert all(k.endswith("num_batches_tracked") for k in missing)


def test_save_reference_checkpoints(ref, tmp_path):
    """Full-tree export through the reference's own prefix-munging loader
    (PATS.load_state_dict, models/pats.py:88-109)."""
    import types

    import jax

    from pats_tpu.io.convert import (load_reference_checkpoints,
                                     save_reference_checkpoints)
    from pats_tpu.models.cascade import PATSCascade
    from pats_tpu.config import PATSConfig

    model = PATSCascade(config=PATSConfig().model)
    left = np.zeros((96, 96, 3), np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(3),
                                    left, left)
    variables = jax.tree.map(np.asarray, variables)
    paths = [str(tmp_path / f"{n}.pt") for n in ("c", "f", "t")]
    save_reference_checkpoints(variables, *paths)

    rcfg = types.SimpleNamespace(if_local=False, if_outdoor=True,
                                 merge_new=True, checkpoint=paths[0],
                                 checkpoint2=paths[1], checkpoint3=paths[2])
    torch.manual_seed(4)
    pats = ref.pats.PATS(rcfg)
    pats.load_state_dict()     # reads the three paths from its config

    # and the re-import of the exported files equals the original tree
    back = load_reference_checkpoints(*paths)
    for (pa, va), (pb, vb) in zip(
            jax.tree_util.tree_flatten_with_path(variables)[0][:50],
            jax.tree_util.tree_flatten_with_path(back)[0][:50]):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
