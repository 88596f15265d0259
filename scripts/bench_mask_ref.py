"""Single-core CLK-encoding throughput: our vectorised MaskEncoder vs a
straight per-row re-derivation of the reference algorithm (the conformance
oracle from tests/test_encode.py — same hashlib digests, same bit layout;
the reference itself cannot run here, its `bitarray` dep is not installed,
so the oracle is the faithful stand-in). Records the evidence for
"matches-or-beats the reference's single-node throughput" in BASELINE.md.

Usage: python scripts/bench_mask_ref.py [n_entities]
"""

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000

    from test_encode import _clk, oracle_encode  # noqa: E402

    from pprl_ray.functions.encode import MaskEncoder  # noqa: E402

    config = _clk()
    ids = [f"e{i}" for i in range(n)]
    attrs = {
        "firstName": [f"Name{i % 997}" for i in range(n)],
        "lastName": [f"Surname{i % 1499}" for i in range(n)],
        "dateOfBirth": [f"19{i % 90 + 10}-0{i % 9 + 1}-1{i % 9}" for i in range(n)],
        "gender": ["f" if i % 2 else "m" for i in range(n)],
    }
    entities = [(ids[i], {k: v[i] for k, v in attrs.items()}) for i in range(n)]

    enc = MaskEncoder(config)
    t0 = time.perf_counter()
    packed, _ = enc.encode(ids, attrs)
    ours = time.perf_counter() - t0

    t0 = time.perf_counter()
    ref = oracle_encode(entities, config)
    theirs = time.perf_counter() - t0

    # spot-check equality on the first rows
    import numpy as np

    for i in range(min(50, n)):
        assert packed[i].tobytes() == np.packbits(ref[i]).tobytes(), i

    print(
        f"entities={n}  ours={n/ours:,.0f} ent/s  reference-style={n/theirs:,.0f} ent/s  "
        f"speedup={theirs/ours:.2f}x (single core, CLK 1024x5 sha1 double_hash, 4 attrs)"
    )


if __name__ == "__main__":
    main()
