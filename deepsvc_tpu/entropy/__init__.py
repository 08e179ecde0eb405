from .bottleneck import EntropyBottleneck, build_bottleneck_tables
from .cdf import CdfTable, build_table_from_pmfs, pmf_to_quantized_cdf
from .gaussian import (
    GaussianConditional,
    build_gaussian_tables,
    build_indexes,
    gaussian_likelihood,
    get_scale_table,
)
from .ops import add_uniform_noise, lower_bound, quantize_ste, ste_round

__all__ = [
    "EntropyBottleneck",
    "build_bottleneck_tables",
    "CdfTable",
    "build_table_from_pmfs",
    "pmf_to_quantized_cdf",
    "GaussianConditional",
    "build_gaussian_tables",
    "build_indexes",
    "gaussian_likelihood",
    "get_scale_table",
    "add_uniform_noise",
    "lower_bound",
    "quantize_ste",
    "ste_round",
]
