"""Byte-level interop against the REFERENCE's own stream writer.

Executes the reference's pure-Python ``stream_dump``/``stream_load``
(utils/stream_utils.py:11-82 — struct.pack over torch-cpu tensors) on the
same random batch and asserts our vectorized writer produces the
byte-identical file, our loader reads the reference's file, and the
reference's loader reads ours. Skipped when the reference checkout is not
present (normal CI has no /root/reference)."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

REF_STREAM = "/root/reference/utils/stream_utils.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_STREAM), reason="reference checkout not present")


def _load_reference_module():
    spec = importlib.util.spec_from_file_location("ref_stream_utils",
                                                  REF_STREAM)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _batch(n=17, sh_degree=2, seed=5):
    rng = np.random.default_rng(seed)
    k_rest = (sh_degree + 1) ** 2 - 1
    return {
        "start_frame": rng.integers(0, 50, n).astype(np.uint32),
        "end_frame": rng.integers(50, 100, n).astype(np.uint32),
        "xyz": rng.normal(size=(n, 3)).astype(np.float32),
        "f_dc": rng.normal(size=(n, 1, 3)).astype(np.float32),
        "f_rest": rng.normal(size=(n, k_rest, 3)).astype(np.float32),
        "scaling": rng.normal(size=(n, 3)).astype(np.float32),
        "rotation": rng.normal(size=(n, 4)).astype(np.float32),
        "opacity": rng.normal(size=(n, 1)).astype(np.float32),
    }


def test_stream_bytes_match_reference_writer(tmp_path):
    import torch

    ref = _load_reference_module()
    from gsplat_tpu.utils.stream import stream_dump, stream_load

    sh_degree = 2
    batch = _batch(sh_degree=sh_degree)

    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    ref_dir.mkdir()
    our_dir.mkdir()

    torch_batch = {k: torch.from_numpy(np.asarray(v))
                   for k, v in batch.items()}
    ref.stream_dump(torch_batch, str(ref_dir / "streamable.dat"),
                    shs_degree=sh_degree)
    stream_dump(batch, str(our_dir / "streamable.dat"), sh_degree=sh_degree)

    ref_bytes = (ref_dir / "streamable.dat").read_bytes()
    our_bytes = (our_dir / "streamable.dat").read_bytes()
    assert len(ref_bytes) > 0
    assert our_bytes == ref_bytes, "stream records are not byte-identical"

    # sidecars carry the same format description
    ref_fmt = json.loads((ref_dir / "format.json").read_text())
    our_fmt = json.loads((our_dir / "format.json").read_text())
    assert ref_fmt == our_fmt

    # cross-loading: our loader on the reference's file...
    loaded = stream_load(str(ref_dir / "format.json"),
                         str(ref_dir / "streamable.dat"))
    np.testing.assert_array_equal(loaded["start_frame"],
                                  batch["start_frame"].astype(np.int32))
    np.testing.assert_allclose(loaded["xyz"], batch["xyz"], rtol=0)
    np.testing.assert_allclose(
        loaded["f_rest"], batch["f_rest"], rtol=0)
    # ...and the reference's loader on ours
    rows = ref.stream_load(str(our_dir / "format.json"),
                           str(our_dir / "streamable.dat"))
    assert len(rows) == batch["xyz"].shape[0]
    first = rows[0]
    assert first[0] == int(batch["start_frame"][0])
    np.testing.assert_allclose(np.asarray(first[2:5], np.float32),
                               batch["xyz"][0], rtol=0)
