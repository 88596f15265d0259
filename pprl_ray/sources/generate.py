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

__all__ = [
    "generated_entities",
    "gecko_generated_entities",
    "is_gecko_config",
    "GENERATOR_FUNCTIONS",
    "GECKO_GENERATOR_FUNCTIONS",
]

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


# --- Gecko-parity generation --------------------------------------------------
#
# Reference ``pprl estimate gecko`` (`pprl_client/cli.py:428-495`, config
# model `pprl_client/model.py:23-31`): entities generated from FREQUENCY
# TABLES (the gecko-data CSV corpora) instead of Faker providers — each
# generator spec names one or more output attributes drawn jointly from a
# weighted value table. The gecko library and its pinned-SHA data repo are
# external (network), so the same config surface resolves against pure-
# numpy deterministic implementations: weighted sampling is a searchsorted
# over the cumulative frequency column driven by a splitmix64 stream keyed
# on (seed, generator index, row id) — identical output under any
# partitioning/parallelism, unlike gecko's shared-rng sequential draw
# (semantics parity: same marginal distribution; determinism is ours).
#
# Scale note: frequency tables are the SMALL side (gecko-data files are
# 10^3-10^6 rows); they load once on the driver at graph-construction time
# and ship to workers inside the task closure — never per batch.


def _load_freq_table(args: dict, value_columns: list[str], freq_column: str):
    import pyarrow.csv as pacsv

    path = args.get("csv_file_path")
    if not path:
        raise ValueError("frequency-table generator requires csv_file_path")
    opts = {}
    if args.get("delimiter"):
        opts["parse_options"] = pacsv.ParseOptions(delimiter=args["delimiter"])
    t = pacsv.read_csv(path, **opts)
    for c in value_columns + [freq_column]:
        if c not in t.column_names:
            raise ValueError(f"column `{c}` not present in {path}")
    freq = np.asarray(t[freq_column].to_pylist(), dtype=np.float64)
    if len(freq) == 0:
        raise ValueError(f"frequency table {path} is empty")
    if np.any(freq < 0) or freq.sum() <= 0:
        raise ValueError(f"frequency column `{freq_column}` must be non-negative with positive sum")
    cum = np.cumsum(freq)
    values = [np.array([str(v) for v in t[c].to_pylist()], dtype=object) for c in value_columns]
    return cum, values


def _gecko_from_frequency_table(spec: dict):
    args = spec.get("args") or {}
    names = list(spec["attribute_names"])
    if len(names) != 1:
        raise ValueError("from_frequency_table yields exactly one attribute")
    vc = args.get("value_column")
    if not vc:
        raise ValueError("from_frequency_table requires value_column")
    cum, values = _load_freq_table(args, [vc], args.get("freq_column", "count"))

    def _draw(stream: np.ndarray) -> list[np.ndarray]:
        u = _u01(stream) * cum[-1]
        idx = np.searchsorted(cum, u, side="right").clip(0, len(cum) - 1)
        return [values[0][idx]]

    return _draw


def _gecko_from_multicolumn_frequency_table(spec: dict):
    args = spec.get("args") or {}
    names = list(spec["attribute_names"])
    vcs = list(args.get("value_columns") or [])
    if not vcs:
        raise ValueError("from_multicolumn_frequency_table requires value_columns")
    if len(vcs) != len(names):
        raise ValueError("attribute_names and value_columns must align")
    cum, values = _load_freq_table(args, vcs, args.get("freq_column", "count"))

    def _draw(stream: np.ndarray) -> list[np.ndarray]:
        u = _u01(stream) * cum[-1]
        idx = np.searchsorted(cum, u, side="right").clip(0, len(cum) - 1)
        # JOINT draw: one sampled row supplies every output attribute,
        # preserving cross-column correlation (given_name <-> gender)
        return [v[idx] for v in values]

    return _draw


def _gecko_from_uniform_distribution(spec: dict):
    args = spec.get("args") or {}
    if len(spec["attribute_names"]) != 1:
        raise ValueError("from_uniform_distribution yields exactly one attribute")
    lo = float(args.get("low", 0.0))
    hi = float(args.get("high", 1.0))
    nd = int(args.get("precision", 6))
    if lo > hi:
        raise ValueError("low must not exceed high")

    def _draw(stream: np.ndarray) -> list[np.ndarray]:
        x = lo + _u01(stream) * (hi - lo)
        return [np.array([f"{v:.{nd}f}" for v in x], dtype=object)]

    return _draw


def _gecko_from_normal_distribution(spec: dict):
    args = spec.get("args") or {}
    if len(spec["attribute_names"]) != 1:
        raise ValueError("from_normal_distribution yields exactly one attribute")
    mean = float(args.get("mean", 0.0))
    sd = float(args.get("sd", 1.0))
    nd = int(args.get("precision", 6))
    if sd < 0:
        raise ValueError("sd must be non-negative")

    def _draw(stream: np.ndarray) -> list[np.ndarray]:
        # Box-Muller over two independent substreams — still a pure
        # function of the row id, so partitioning-invariant
        u1 = np.maximum(_u01(stream + np.uint64(0xA5A5A5A5)), 1e-12)
        u2 = _u01(stream + np.uint64(0x5A5A5A5A))
        z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
        x = mean + sd * z
        return [np.array([f"{v:.{nd}f}" for v in x], dtype=object)]

    return _draw


GECKO_GENERATOR_FUNCTIONS = {
    "from_frequency_table": _gecko_from_frequency_table,
    "from_multicolumn_frequency_table": _gecko_from_multicolumn_frequency_table,
    "from_uniform_distribution": _gecko_from_uniform_distribution,
    "from_normal_distribution": _gecko_from_normal_distribution,
}


def is_gecko_config(config: dict) -> bool:
    """Gecko configs name a LIST of attributes per generator
    (``attribute_names``); Faker configs name one (``attribute_name``)."""
    specs = config.get("generators") or []
    return bool(specs) and all("attribute_names" in s for s in specs)


def gecko_generated_entities(config: dict):
    """GeckoGeneratorConfig-shaped dict -> lazy entity Dataset with an
    ``id`` string column plus one column per configured output attribute.
    Frequency tables load once at graph-construction time (driver), draws
    are vectorised weighted searchsorted per batch."""
    seed = int(config["seed"])
    count = int(config["count"])
    if count < 0:
        raise ValueError("count must be greater than or equal to 0")
    specs = list(config.get("generators") or [])
    if not specs:
        raise ValueError("generators must contain at least one entry")
    draws = []
    all_names: list[str] = []
    for spec in specs:
        fn = spec.get("function_name")
        factory = GECKO_GENERATOR_FUNCTIONS.get(fn)
        if factory is None:
            raise ValueError(f"invalid gecko function: {fn}")
        names = list(spec.get("attribute_names") or [])
        if not names:
            raise ValueError(f"generator `{fn}` is missing attribute_names")
        dup = set(names) & set(all_names)
        if dup:
            raise ValueError(f"duplicate attribute names: {sorted(dup)}")
        all_names.extend(names)
        draws.append((names, factory(spec)))

    import ray.data as rd

    def _gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy().astype(np.uint64)
        cols: dict = {"id": pa.array([str(i) for i in ids.tolist()], pa.string())}
        for gi, (names, draw) in enumerate(draws):
            stream = splitmix64(
                ids
                + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15)
                + np.uint64(gi + 1) * np.uint64(0x94D049BB133111EB)
            )
            for name, vals in zip(names, draw(stream)):
                cols[name] = pa.array(vals, pa.string())
        return pa.table(cols)

    return rd.range(count).map_batches(_gen, batch_format="pyarrow")
