"""Config-driven synthetic entity generation — reference ``pprl estimate
faker`` parity (`/root/reference/packages/pprl_client/pprl_client/cli.py:503-563`,
config model `pprl_client/model.py:6-20`).

The reference resolves ``function_name`` strings from a generator config
JSON against Faker providers. Faker is external data / not in this
environment, so the same config surface resolves against an embedded
DETERMINISTIC registry instead: every value is a pure function of
``(seed, row id, attribute index)`` via splitmix64 streams, so generated
tables are identical under any partitioning or parallelism — and usable as
reproducible estimate/benchmark inputs. Unknown names fail with the
reference's ``invalid faker function: <name>`` error.

Config shape (identical to ``FakerGeneratorConfig``)::

    {"seed": 727, "count": 1000, "generators": [
        {"function_name": "first_name", "attribute_name": "firstName"},
        {"function_name": "date_of_birth", "attribute_name": "dob",
         "args": {"minimum_age": 18, "maximum_age": 90}},
        {"function_name": "random_element", "attribute_name": "gender",
         "args": {"elements": ["f", "m", "x"]}}]}
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sketches.hashing import splitmix64
from .corpus import _FIRST_NAMES, _LAST_NAMES

__all__ = ["generated_entities", "GENERATOR_FUNCTIONS"]

_CITIES = (
    "Springfield Riverton Lakewood Fairview Georgetown Ashland Milton Dayton "
    "Clinton Franklin Salem Oxford Bristol Dover Hudson Auburn".split()
)


def _u01(stream: np.ndarray) -> np.ndarray:
    return splitmix64(stream).astype(np.float64) / float(2**64)


def _pick(stream: np.ndarray, choices) -> np.ndarray:
    arr = np.array(list(choices), dtype=object)
    idx = (splitmix64(stream) % np.uint64(len(arr))).astype(np.int64)
    return arr[idx]


def _gen_first_name(stream, args):
    return _pick(stream, _FIRST_NAMES)


def _gen_last_name(stream, args):
    return _pick(stream, _LAST_NAMES)


def _gen_name(stream, args):
    fn = _pick(stream + np.uint64(1), _FIRST_NAMES)
    ln = _pick(stream + np.uint64(2), _LAST_NAMES)
    return np.array([f"{a} {b}" for a, b in zip(fn, ln)], dtype=object)


def _gen_date_of_birth(stream, args):
    lo = int(args.get("minimum_age", 0))
    hi = int(args.get("maximum_age", 115))
    if lo > hi:
        raise ValueError("minimum_age must not exceed maximum_age")
    # deterministic reference date (no wall clock: generation must be
    # reproducible across runs), ages uniform in [lo, hi]
    ref_year = 2024
    years = ref_year - lo - (
        splitmix64(stream + np.uint64(3)) % np.uint64(hi - lo + 1)
    ).astype(np.int64)
    months = 1 + (splitmix64(stream + np.uint64(4)) % np.uint64(12)).astype(np.int64)
    days = 1 + (splitmix64(stream + np.uint64(5)) % np.uint64(28)).astype(np.int64)
    return np.array(
        [f"{y:04d}-{m:02d}-{d:02d}" for y, m, d in zip(years, months, days)], dtype=object
    )


def _gen_random_int(stream, args):
    lo = int(args.get("min", 0))
    hi = int(args.get("max", 9999))
    if lo > hi:
        raise ValueError("min must not exceed max")
    vals = lo + (splitmix64(stream + np.uint64(6)) % np.uint64(hi - lo + 1)).astype(np.int64)
    return np.array([str(v) for v in vals], dtype=object)


def _gen_random_element(stream, args):
    elements = args.get("elements")
    if not elements:
        raise ValueError("`random_element` requires a non-empty elements list")
    return _pick(stream + np.uint64(7), elements)


def _gen_numerify(stream, args):
    text = str(args.get("text", "###"))
    holes = [i for i, ch in enumerate(text) if ch == "#"]
    out = []
    for j, base in enumerate(stream):
        digits = splitmix64(base + np.uint64(8) + np.uint64(13) * np.arange(len(holes), dtype=np.uint64)) % np.uint64(10)
        chars = list(text)
        for i, d in zip(holes, digits):
            chars[i] = str(int(d))
        out.append("".join(chars))
    return np.array(out, dtype=object)


def _gen_city(stream, args):
    return _pick(stream + np.uint64(9), _CITIES)


def _gen_email(stream, args):
    fn = _pick(stream + np.uint64(10), _FIRST_NAMES)
    ln = _pick(stream + np.uint64(11), _LAST_NAMES)
    dom = _pick(stream + np.uint64(12), ("example.com", "example.org", "example.net"))
    return np.array(
        [f"{a.lower()}.{b.lower()}@{d}" for a, b, d in zip(fn, ln, dom)], dtype=object
    )


GENERATOR_FUNCTIONS = {
    "first_name": _gen_first_name,
    "last_name": _gen_last_name,
    "name": _gen_name,
    "date_of_birth": _gen_date_of_birth,
    "random_int": _gen_random_int,
    "random_element": _gen_random_element,
    "numerify": _gen_numerify,
    "city": _gen_city,
    "email": _gen_email,
}


def generated_entities(config: dict):
    """FakerGeneratorConfig-shaped dict -> lazy entity Dataset with an
    ``id`` string column plus one column per configured generator."""
    seed = int(config["seed"])
    count = int(config["count"])
    if count < 0:
        raise ValueError("count must be greater than or equal to 0")
    specs = list(config.get("generators") or [])
    if not specs:
        raise ValueError("generators must contain at least one entry")
    for spec in specs:
        fn = spec.get("function_name")
        if fn not in GENERATOR_FUNCTIONS:
            raise ValueError(f"invalid faker function: {fn}")
        if not spec.get("attribute_name"):
            raise ValueError(f"generator `{fn}` is missing attribute_name")

    import ray.data as rd

    def _gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy().astype(np.uint64)
        cols: dict = {"id": pa.array([str(i) for i in ids.tolist()], pa.string())}
        for ai, spec in enumerate(specs):
            # independent stream per (seed, attribute index, row id)
            base = splitmix64(
                ids + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15) + np.uint64(ai + 1) * np.uint64(0xBF58476D1CE4E5B9)
            )
            values = GENERATOR_FUNCTIONS[spec["function_name"]](base, spec.get("args") or {})
            cols[spec["attribute_name"]] = pa.array(values, pa.string())
        return pa.table(cols)

    return rd.range(count).map_batches(_gen, batch_format="pyarrow")
