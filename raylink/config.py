"""Match-configuration model.

Accepts the same nested JSON/dict configuration surface as the reference
(/root/reference/README.md:20-118, test_parameters.json, parsed by
settings/settings.jl:11-100) and adds two rebuild-specific sections:

- ``blocking``: candidate-generation keys, the hot-block salting cap and the
  salting strategy (the reference scores the full cross product; at 10^12-turn
  scale candidate generation must be blocked and skew-managed explicitly).
- ``execution``: Ray-level knobs (scorer actor-pool size, batch sizes,
  checkpoint dir) that the reference has no equivalent for.

Config shape::

    {
      "link_type": "link_only" | "dedupe_only" | "link_and_dedupe",
      "idvar": ["ida", "idb"],
      "comparisons": {
        "name": "total",
        "threshold_match": 0.85, "tol_em": 1e-5, "p_m": 0.1,
        "prior_lambda": 0.0, "w_lambda": 0.0, "prior_pi": 0.0, "w_pi": 0.0,
        "variables": [
          {"varname": ..., "method": ..., ...params},
          {"comparisons": {...nested...}},
        ],
      },
      "blocking":  {"keys": [...], "cap": 512, ...},   # rebuild extension
      "execution": {...},                               # rebuild extension
    }

Variable methods: ``exact``, ``bool``, ``fuzzy``, ``string``, ``numeric``,
``float``, ``int``, ``token_lv`` (rebuild extension: token-level Levenshtein
over token-id sequences, per the north star), or any alias in
:data:`raylink.functions.strdist.METHOD_ALIASES` (dispatch mirrors
fastlink.jl:37-110).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from .functions.strdist import METHOD_ALIASES

__all__ = [
    "VarConfig",
    "ComparisonConfig",
    "BlockingConfig",
    "ExecutionConfig",
    "LinkConfig",
    "parse_config",
]


@dataclass
class VarConfig:
    """One comparison variable (a ``varname`` dict in the reference schema)."""

    name: str
    method: str
    partial: bool = True
    cut_a: float | None = None  # defaults depend on method, see resolve()
    cut_b: float | None = None
    w: float = 0.1
    upper: bool = False
    tf_adjust: bool = False
    tf_adjustment_weight: float = 1.0
    tf_minimum_u_value: float = 0.001
    # reproduce gammaCKfuzzy.jl's 16-codeunit truncation (the reference's
    # bit-parallel JW compares only the first 16 codeunits of each string,
    # gammaCKfuzzy.jl:29,215).  Off by default — truncation changes scores
    # on long fields; turn on for bit-exact parity with the fuzzy kernel.
    # ASCII assumption as in the reference (codeunits == characters).
    fuzzy_truncate: bool = False

    # resolved canonical kernel: exact | numeric | string | token_lv
    kernel: str = field(init=False, default="")
    distmethod: str = field(init=False, default="jw")

    def __post_init__(self) -> None:
        m = self.method.lower()
        if m in ("exact", "bool"):
            self.kernel = "exact"
        elif m in ("numeric", "float", "int"):
            self.kernel = "numeric"
            if self.cut_a is None:
                self.cut_a = 1
            if self.cut_b is None:
                self.cut_b = 2
        elif m == "token_lv":
            self.kernel = "token_lv"
        elif m in ("fuzzy", "string") or m in METHOD_ALIASES:
            self.kernel = "string"
            self.distmethod = METHOD_ALIASES.get(m, "jw")
        else:
            raise ValueError(f"unknown comparison method {self.method!r}")
        if self.cut_a is None:
            self.cut_a = 0.92
        if self.cut_b is None:
            self.cut_b = 0.88


@dataclass
class ComparisonConfig:
    """A (possibly nested) ``comparisons`` node: variables + EM parameters."""

    name: str
    variables: list[Any]  # VarConfig | ComparisonConfig, in declared order
    threshold_match: float = 0.85
    p_m: float = 0.1
    tol_em: float = 1e-5
    iter_max: int = 5000
    prior_lambda: float = 0.0
    w_lambda: float = 0.0
    prior_pi: float = 0.0
    w_pi: float = 0.0
    address_field: list[bool] | None = None
    u_b: float = 1e10

    def leaf_vars(self) -> list[VarConfig]:
        """All leaf variables in depth-first declared order."""
        out: list[VarConfig] = []
        for v in self.variables:
            if isinstance(v, ComparisonConfig):
                out.extend(v.leaf_vars())
            else:
                out.append(v)
        return out

    def em_kwargs(self) -> dict[str, Any]:
        return {
            "p_m": self.p_m,
            "tol": self.tol_em,
            "iter_max": self.iter_max,
            "prior_lambda": self.prior_lambda,
            "w_lambda": self.w_lambda,
            "prior_pi": self.prior_pi,
            "w_pi": self.w_pi,
            "address_field": self.address_field,
            "threshold_match": self.threshold_match,
            "u_b": self.u_b,
        }


@dataclass
class BlockingConfig:
    """Candidate-generation settings (rebuild extension; no reference analog).

    ``keys`` name record columns whose combined value is the block key;
    ``rules`` (mutually exclusive) names SEVERAL such key sets for
    multi-pass OR blocking — candidate pairs come from the union of the
    rules, each scored once (see :mod:`raylink.ops.multiblock`).  A
    block whose record count exceeds ``cap`` is *salted*: split into
    ``ceil(n / cap)`` sub-blocks by a stable record-id hash, and candidate
    pairs are generated for every sub-block combination so no pair is lost
    (see :mod:`raylink.stages.blocking`).  ``max_salts`` bounds replication on
    pathological blocks; with ``drop_oversized=True`` blocks needing more than
    ``max_salts`` salts are dropped *with an explicit counter* (never
    silently).
    """

    keys: list[str] = field(default_factory=list)
    rules: list[list[str]] = field(default_factory=list)
    cap: int = 512
    max_salts: int = 64
    drop_oversized: bool = False
    # sorted-neighborhood mode (Hernandez-Stolfo 1995): candidate pairs
    # are the records within ``snm_window`` positions of each other
    # under ORDER BY (snm_key, id) — linear pair count, immune to
    # hot-key skew (see raylink/ops/snm.py).  Mutually exclusive with
    # keys/rules.  Pick a HIGH-CARDINALITY key (typically a
    # concatenation like lastname|firstname|street): on a pooled
    # low-cardinality key the ties eat the window and recall collapses
    # (measured: 3/200 truth pairs on a ~100-value firstname pool vs
    # 196/200 on the composite — BASELINE.md round-4 SNM experiment).
    snm_key: str | None = None
    snm_window: int = 10

    def __post_init__(self) -> None:
        if self.keys and self.rules:
            raise ValueError(
                "blocking.keys and blocking.rules are mutually exclusive: "
                "rules IS the multi-pass generalization of a single key set"
            )
        if self.snm_key and (self.keys or self.rules):
            raise ValueError(
                "blocking.snm_key is mutually exclusive with keys/rules: "
                "sorted-neighborhood replaces equality blocking"
            )
        if self.snm_key and self.snm_window < 2:
            raise ValueError(
                f"blocking.snm_window must be >= 2, got {self.snm_window}"
            )


@dataclass
class ExecutionConfig:
    """Ray execution knobs."""

    scorer_concurrency: int | tuple[int, int] | None = None
    scorer_batch_size: int = 8192
    pair_shuffle_partitions: int | None = None
    checkpoint_dir: str | None = None
    cc_num_partitions: int = 16
    # edges; below this CC runs driver-side.  Sized to driver MEMORY,
    # not caution: edges stream in 1M-row batches and the union-find
    # state is O(unique endpoints); 8M string-id edges peak ~1-2 GB on
    # the driver, while the distributed path costs a join+groupby
    # shuffle PER ROUND (measured r5: a 2.7M-edge problem paid 47 s
    # distributed vs ~3 s local — crossing over too early dominated the
    # 16x-capacity wall).  64-bit endpoint-hash collision odds at 8M
    # edges are ~1e-5 and require both colliders to be edge endpoints.
    cc_local_threshold: int = 8_000_000


@dataclass
class LinkConfig:
    link_type: str
    idvar: tuple[str, str]
    comparisons: ComparisonConfig
    blocking: BlockingConfig = field(default_factory=BlockingConfig)
    execution: ExecutionConfig = field(default_factory=ExecutionConfig)

    def leaf_vars(self) -> list[VarConfig]:
        return self.comparisons.leaf_vars()

    def levels(self) -> list[list[ComparisonConfig]]:
        """Comparison nodes grouped by depth, deepest level first.

        Mirrors ``parse_configuration`` (settings.jl:74-100, note the
        ``reverse`` at :96): nested comparisons are EM-ed before their parent
        so their thresholded result can serve as a virtual variable.
        """
        by_depth: list[list[ComparisonConfig]] = []

        def walk(node: ComparisonConfig, depth: int) -> None:
            while len(by_depth) <= depth:
                by_depth.append([])
            by_depth[depth].append(node)
            for v in node.variables:
                if isinstance(v, ComparisonConfig):
                    walk(v, depth + 1)

        walk(self.comparisons, 0)
        return [lvl for lvl in reversed(by_depth) if lvl]


_VAR_KEYS = {
    "partial",
    "cut_a",
    "cut_b",
    "w",
    "upper",
    "tf_adjust",
    "tf_adjustment_weight",
    "tf_minimum_u_value",
    "fuzzy_truncate",
}


def _parse_comparisons(d: dict) -> ComparisonConfig:
    variables: list[Any] = []
    for v in d["variables"]:
        if "comparisons" in v:
            variables.append(_parse_comparisons(v["comparisons"]))
        else:
            kwargs = {k: v[k] for k in _VAR_KEYS if k in v}
            variables.append(
                VarConfig(name=v["varname"], method=v["method"], **kwargs)
            )
    cc = ComparisonConfig(name=d["name"], variables=variables)
    for k in (
        "threshold_match",
        "p_m",
        "tol_em",
        "iter_max",
        "prior_lambda",
        "w_lambda",
        "prior_pi",
        "w_pi",
        "address_field",
        "u_b",
    ):
        if k in d:
            setattr(cc, k, d[k])
    if "digit_precision" in d:
        # the reference's BigFloat precision knob (emlink.jl:44-46); this
        # engine runs float64 log-space EM (verified against the reference's
        # own fixture), so the knob cannot take effect — say so instead of
        # silently ignoring it
        import warnings

        warnings.warn(
            "digit_precision is a BigFloat knob of the reference "
            "implementation; this engine's EM is float64 log-space and "
            "ignores it (see raylink/stages/em.py module docstring)",
            UserWarning,
            stacklevel=3,
        )
    return cc


def parse_config(config: dict) -> LinkConfig:
    """Parse a reference-schema JSON/dict configuration into a LinkConfig."""
    idvar = config.get("idvar", ["id_a", "id_b"])
    blocking = BlockingConfig(**config.get("blocking", {}))
    execution = ExecutionConfig(**config.get("execution", {}))
    lc = LinkConfig(
        link_type=config.get("link_type", "link_only"),
        idvar=(idvar[0], idvar[-1]),
        comparisons=_parse_comparisons(config["comparisons"]),
        blocking=blocking,
        execution=execution,
    )
    names = [v.name for v in lc.leaf_vars()]
    if len(names) != len(set(names)):
        raise ValueError(f"duplicate variable names in config: {names}")
    if len(names) > 32:
        raise ValueError("at most 32 comparison variables supported (uint64 pattern key)")
    return lc
