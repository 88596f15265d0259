"""Round-4 second-session additions: DDSketch distributed plumbing."""

import numpy as np


def test_fused_profile_with_ddsketch(ray_session):
    """DDSketch rides the fused one-pass profile bit-identically to a
    standalone sketch_by_key build AND to a local single-pass sketch
    (its counter-add merge is exactly topology-invariant)."""
    from pprl_ray.pipelines.profile import (
        ProfileSpec, corpus_profile, finalize_profile,
    )
    from pprl_ray.sketches import DDSketch
    from pprl_ray.sources.corpus import synth_corpus
    from pprl_ray.state.aggregate import finalize_sketches, sketch_by_key

    c = synth_corpus(3000, override_num_blocks=4)
    specs = [ProfileSpec("ntok_dd", "ddsketch", DDSketch, "n_tok", "source")]
    fused = finalize_profile(corpus_profile(c, specs), specs)
    alone = finalize_sketches(
        sketch_by_key(c, DDSketch, "n_tok", "source"), DDSketch
    )
    assert {k for _, k in fused} == set(alone)
    for (_, key), sk in fused.items():
        assert sk.to_bytes() == alone[key].to_bytes()

    # and equals a driver-local single sketch over the gathered column
    rows = c.select_columns(["source", "n_tok"]).to_pandas()
    for key, sk in alone.items():
        local = DDSketch()
        local.update(rows.loc[rows["source"] == key, "n_tok"].to_numpy())
        assert sk.to_bytes() == local.to_bytes()
        # relative-error contract on the distributed sketch
        vals = np.sort(rows.loc[rows["source"] == key, "n_tok"].to_numpy())
        for q in (0.5, 0.95):
            true = float(vals[int(np.floor(q * (len(vals) - 1)))])
            assert abs(sk.quantile(q) - true) <= true / 9 + 1e-9


def test_cap_per_group_partitioning_invariant(ray_session):
    """Same sample under any block count; caps respected; small groups
    pass through whole."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from pprl_ray.stages.sample import cap_per_group

    n = 5000
    src = ["s%d" % (i % 7) for i in range(n)]
    src[:3] = ["tiny"] * 3  # a group smaller than k
    t = pa.table({"doc_id": list(range(n)), "source": src})

    outs = []
    for blocks in (2, 16):
        ds = rd.from_arrow(t).repartition(blocks)
        out = (
            cap_per_group(ds, "source", "doc_id", 20)
            .to_pandas()
            .sort_values(["source", "doc_id"])
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    counts = outs[0].groupby("source").size()
    assert (counts <= 20).all()
    assert counts["tiny"] == 3


def test_stratified_split_exact_proportions_and_invariance(ray_session):
    """Exact per-group band sizes, tiny-group edge (all-test), block-count
    invariance, and parity with a local sort-based reference."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from pprl_ray.sketches.hashing import splitmix64
    from pprl_ray.stages.sample import stratified_split_exact

    n = 4000
    src = ["g%d" % (i % 5) for i in range(n)]
    src[0] = "single"  # 1-row group: 90/5/5 floors to 0/0 -> all 'test'
    t = pa.table({"doc_id": list(range(n)), "source": src})
    fr = {"train": 0.90, "val": 0.05, "test": 0.05}

    outs = []
    for blocks in (3, 17):
        out = (
            stratified_split_exact(
                rd.from_arrow(t).repartition(blocks), "source", "doc_id", fr
            )
            .to_pandas()
            .sort_values(["source", "doc_id"])
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0]

    # local reference: rank by splitmix64 within group, integer bands
    ref = pd.DataFrame({"doc_id": range(n), "source": src})
    ref["z"] = splitmix64(ref["doc_id"].to_numpy().astype(np.uint64))
    ref["rn"] = ref.groupby("source")["z"].rank(method="first").astype(int)
    sizes = ref.groupby("source")["z"].transform("size")
    ref["split"] = np.where(
        ref["rn"] <= (sizes * 90) // 100,
        "train",
        np.where(ref["rn"] <= (sizes * 95) // 100, "val", "test"),
    )
    ref = ref.sort_values(["source", "doc_id"]).reset_index(drop=True)
    assert (got["split"].to_numpy() == ref["split"].to_numpy()).all()

    counts = got.groupby(["source", "split"]).size().unstack(fill_value=0)
    for g in ("g0", "g1", "g2", "g3", "g4"):
        ng = counts.loc[g].sum()
        assert counts.loc[g, "train"] == (ng * 90) // 100
        assert counts.loc[g, "val"] == (ng * 95) // 100 - (ng * 90) // 100
    assert counts.loc["single", "test"] == 1
