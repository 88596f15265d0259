"""Honesty tests for the pinned segment->mask VALUES oracles
(pprl_ray/golden/mask_pins.py): each sha1 mask query masks exactly one
attribute, so re-deriving the segment->mask mapping through the live Ray
pipeline on any sf dir must reproduce the pins exactly."""

MASK_PIN_QUERIES = ("clk_mask", "clk_mask_hardened", "rbf_mask", "clkrbf_mask",
                    "clk_mask_sha512", "clk_mask_hmac")


def test_mask_pins_match_live_requery(ray_session, sf_dir):
    import pyarrow.parquet as pq

    import __ray_entry__ as e
    from pprl_ray.golden import mask_pins as mp

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    seg_of = {
        str(k): s
        for k, s in zip(cust["c_custkey"].to_pylist(), cust["c_mktsegment"].to_pylist())
    }
    qs = e.queries()
    for name in MASK_PIN_QUERIES:
        df = qs[name](sf_dir).to_pandas()
        mapping: dict[str, str] = {}
        for rid, val in zip(df["id"], df["value"]):
            seg = seg_of[rid]
            assert mapping.setdefault(seg, val) == val, (
                f"{name}: segment {seg} maps to two distinct masks"
            )
        assert sorted(mapping.items()) == getattr(mp, f"PIN_{name.upper()}"), (
            f"{name}: pins stale — regenerate with scripts/gen_mask_pins.py"
        )
