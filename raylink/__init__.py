"""raylink — Ray-Data-native probabilistic record linkage.

A brand-new Fellegi–Sunter linkage engine with the query and data-processing
capabilities of jw2249a/FastLink.jl (see SURVEY.md), re-expressed as
ray.data.Dataset pipelines for Parquet transcript tables at very large scale.
"""
from .config import LinkConfig, parse_config  # noqa: F401
from .constants import MATCH1, MATCH2, MISSING, NONMATCH  # noqa: F401
