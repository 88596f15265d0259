from .base import SKETCHES, Sketch, register  # noqa: F401
from .bloom import BloomSketch  # noqa: F401
from .cms import CMSSketch  # noqa: F401
from .countsketch import CountSketch  # noqa: F401
from .cuckoo import CuckooSketch  # noqa: F401
from .ddsketch import DDSketch  # noqa: F401
from .fd import FrequentDirectionsSketch  # noqa: F401
from .gram import GramSketch  # noqa: F401
from .heavyhitters import MGSketch  # noqa: F401
from .spacesaving import SpaceSavingSketch  # noqa: F401
from .tuplesketch import TupleSketch  # noqa: F401
from .req import REQSketch  # noqa: F401
from .histogram import HistogramSketch  # noqa: F401
from .hashing import hash_ints, hash_strings, splitmix64  # noqa: F401
from .hll import HLLSketch  # noqa: F401
from .kmv import KMVSketch  # noqa: F401
from .moments import MomentsSketch  # noqa: F401
from .lsh import (  # noqa: F401
    MinHashSketch,
    SrpCosineSketch,
    WeightedMinHashSketch,
    band_keys,
    hamming64,
    minhash_signatures,
    simhash64,
)
from .prioritysample import PrioritySampleSketch  # noqa: F401
from .quantiles import KLLSketch, TDigestSketch  # noqa: F401
from .theta import ThetaSketch  # noqa: F401
