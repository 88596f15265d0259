"""Checkpoint/resume: kill after K partitions, resume, byte-identical final
sketches; manifests carry lineage + metrics."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pprl_ray.sketches import HLLSketch
from pprl_ray.sources.corpus import synth_batch
from pprl_ray.state.checkpoint import CheckpointedSketchBuild

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture
def corpus_files(tmp_path):
    import numpy as np

    paths = []
    for part in range(4):
        ids = pa.table({"id": pa.array(np.arange(part * 250, (part + 1) * 250), pa.int64())})
        tbl = synth_batch(ids)
        p = str(tmp_path / f"corpus-{part:04d}.parquet")
        pq.write_table(tbl, p)
        paths.append(p)
    return paths


def _factory():
    return HLLSketch(12)


def test_resume_is_byte_identical(corpus_files, tmp_path):
    full_dir = str(tmp_path / "ckpt_full")
    res_dir = str(tmp_path / "ckpt_resume")

    full = CheckpointedSketchBuild(full_dir, _factory, "tokens", "source").run(corpus_files)

    # interrupted run: only 2 partitions complete, then "crash"
    interrupted = CheckpointedSketchBuild(res_dir, _factory, "tokens", "source")
    with pytest.raises(RuntimeError, match="still pending"):
        interrupted.run(corpus_files, max_partitions=2)
    assert len(interrupted.completed_partitions(corpus_files)) == 2

    # resume in a fresh object: only the 2 missing partitions are rebuilt
    resumed = CheckpointedSketchBuild(res_dir, _factory, "tokens", "source").run(corpus_files)
    assert set(full) == set(resumed)
    for k in full:
        assert full[k].to_bytes() == resumed[k].to_bytes(), k


def test_manifests_carry_lineage_and_metrics(corpus_files, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    CheckpointedSketchBuild(ckpt, _factory, "tokens", "source").run(corpus_files)
    manifests = sorted(glob.glob(os.path.join(ckpt, "manifests", "*.json")))
    assert len(manifests) == 4
    seen_inputs = set()
    for m in manifests:
        data = json.load(open(m))
        assert data["rows"] == 250
        assert data["values"] > 0
        assert data["values_per_sec"] > 0
        assert os.path.exists(data["input_path"])
        seen_inputs.add(data["input_path"])
    assert seen_inputs == set(corpus_files)


def test_corrupted_partial_is_rebuilt(corpus_files, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    builder = CheckpointedSketchBuild(ckpt, _factory, "tokens", "source")
    full = builder.run(corpus_files)

    # corrupt one partial file; its manifest hash no longer matches
    part = glob.glob(os.path.join(ckpt, "parts", "*.parquet"))[0]
    tbl = pq.read_table(part)
    bad = tbl.set_column(
        tbl.schema.get_field_index("blob"),
        "blob",
        pa.array([b"garbage"] * tbl.num_rows, pa.large_binary()),
    )
    pq.write_table(bad, part)

    fresh = CheckpointedSketchBuild(ckpt, _factory, "tokens", "source")
    assert len(fresh.completed_partitions(corpus_files)) == 3
    again = fresh.run(corpus_files)
    for k in full:
        assert full[k].to_bytes() == again[k].to_bytes()
