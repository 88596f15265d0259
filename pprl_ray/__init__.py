"""pprl_ray — a Ray-Data-native sketch / PPRL data-processing engine.

Re-expresses the capabilities of the ul-mds/pprl reference (string
transformation, CLK/RBF/CLKRBF Bloom-filter encoding, hardeners, bit-vector
similarity matching) as Ray Data pipelines over zero-copy Arrow batches, and
adds mergeable sketch UDAFs (Bloom, HyperLogLog, count-min, t-digest, KLL),
dedup, ANN and text-analysis operators for large-scale training-data work.
"""

__version__ = "0.1.0"
