"""Deterministic synthetic fixtures (FIXTURES.md F1/F2).

Everything is seeded — two calls with the same arguments produce byte-identical
tables on any machine.  No external data.

- :func:`make_transcripts` — the flagship payload (BASELINE.json
  ``input_hint``): a Parquet-able table of multi-turn conversation / agent
  transcripts ``(conv_id, turn_idx, role, text, tool, ts)`` with planted
  duplicate-conversation clusters (typo'd / paraphrased first turns spanning
  the jw cut bands, shared tool signatures) plus a hot-block stressor, and a
  ground-truth ``(conv_id, entity_id)`` table.
- :func:`make_person_tables` — reference-style dfA/dfB person tables with
  planted cross-table matches, mirroring the reference's 500x350 voter-data
  test fixture (/root/reference/test/runtests.jl:11-31) without copying its
  data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["make_transcripts", "make_person_tables", "make_ref_benchmark_tables"]

_WORDS = (
    "please help me debug the failing unit test in my parser module "
    "can you summarize this quarterly report about revenue growth "
    "write a python script that downloads files from the server "
    "explain how the authentication flow works in our backend "
    "translate the following paragraph into french for the website "
    "find all customers who placed orders above the threshold last month "
    "refactor this function to use async io instead of blocking calls "
    "generate a migration plan for moving the database to the new cluster "
    "review my pull request and point out any security issues "
    "draft an email to the vendor about the delayed shipment"
).split()

_TOOLS = [
    "search",
    "calculator",
    "code_interpreter",
    "file_reader",
    "web_browser",
    "sql_runner",
    "terminal",
    "image_gen",
]

_FILLER = (
    "sure here is the result you asked for "
    "thanks that looks good to me "
    "running the requested command now "
    "the output indicates a possible problem with the configuration "
    "let me check the documentation for that api "
    "i will try a different approach this time"
).split()


def _sentence(rng: np.random.Generator, n_lo: int = 6, n_hi: int = 12) -> str:
    n = int(rng.integers(n_lo, n_hi + 1))
    return " ".join(rng.choice(_WORDS, size=n))


def _typo(rng: np.random.Generator, s: str, n_edits: int = 1) -> str:
    """Apply n single-character edits (swap/replace/delete) to s."""
    chars = list(s)
    for _ in range(n_edits):
        if len(chars) < 4:
            break
        kind = int(rng.integers(0, 3))
        i = int(rng.integers(1, len(chars) - 1))
        if kind == 0:  # transpose
            chars[i], chars[i - 1] = chars[i - 1], chars[i]
        elif kind == 1:  # replace
            chars[i] = chr(ord("a") + int(rng.integers(0, 26)))
        else:  # delete
            del chars[i]
    return "".join(chars)


def _paraphrase(rng: np.random.Generator, s: str) -> str:
    """Word-level perturbation: drop/duplicate/shuffle a couple of words."""
    words = s.split()
    if len(words) > 4:
        kind = int(rng.integers(0, 3))
        i = int(rng.integers(1, len(words) - 1))
        if kind == 0:
            del words[i]
        elif kind == 1:
            words.insert(i, str(rng.choice(_WORDS)))
        else:
            j = int(rng.integers(1, len(words) - 1))
            words[i], words[j] = words[j], words[i]
    return " ".join(words)


#: Bump whenever make_transcripts' OUTPUT changes (schema, truth labels,
#: hot-block shape, token distributions): bench.py keys its /tmp corpus
#: cache on this, so a stale bump silently benchmarks old data.
CORPUS_VERSION = 2


def make_transcripts(
    n_entities: int = 600,
    seed: int = 42,
    hot_block_convs: int = 0,
    max_cluster: int = 4,
    shuffle_rows: bool = True,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Build (turns, truth) DataFrames.

    ``turns`` columns: conv_id:str, turn_idx:int32, role:str, text:str,
    tool:str|None, ts:datetime64[us].  ``truth``: conv_id, entity_id.

    Cluster sizes are 1..max_cluster (skewed toward singletons).  Duplicate
    conversations perturb the entity's first-turn text with char typos (the
    jw-band signal) and reuse its tool signature; non-signal turns differ
    freely.  ``hot_block_convs`` extra singleton conversations share one
    boilerplate first turn to exercise hot-block salting.
    """
    rng = np.random.default_rng(seed)
    rows_conv: list[str] = []
    rows_idx: list[int] = []
    rows_role: list[str] = []
    rows_text: list[str] = []
    rows_tool: list[str | None] = []
    rows_ts: list[int] = []
    truth_conv: list[str] = []
    truth_ent: list[str] = []

    conv_counter = 0
    base_ts = 1_700_000_000_000_000  # us epoch

    def build_turn_plan(
        first_text: str, tools: list[str], crng: np.random.Generator
    ) -> list[tuple[str, str, str | None]]:
        """One entity's canonical conversation: (role, text, tool) per turn."""
        n_turns = int(crng.integers(3, 9))
        tool_iter = iter(tools * 3)
        plan: list[tuple[str, str, str | None]] = []
        for t in range(n_turns):
            if t == 0:
                plan.append(("user", first_text, None))
            elif t % 3 == 1:
                plan.append(
                    (
                        "assistant",
                        " ".join(crng.choice(_FILLER, size=int(crng.integers(4, 10)))),
                        None,
                    )
                )
            elif t % 3 == 2:
                tool = next(tool_iter, "search")
                plan.append(
                    (
                        "tool",
                        f"[{tool} output] "
                        + " ".join(crng.choice(_FILLER, size=int(crng.integers(2, 6)))),
                        tool,
                    )
                )
            else:
                plan.append(
                    (
                        "user",
                        " ".join(crng.choice(_WORDS, size=int(crng.integers(3, 8)))),
                        None,
                    )
                )
        return plan

    def emit_conversation(
        ent_id: str,
        plan: list[tuple[str, str, str | None]],
        crng: np.random.Generator,
    ) -> None:
        nonlocal conv_counter
        conv_id = f"conv-{conv_counter:08d}"
        conv_counter += 1
        truth_conv.append(conv_id)
        truth_ent.append(ent_id)
        ts = base_ts + int(crng.integers(0, 10**9))
        for t, (role, text, tool) in enumerate(plan):
            rows_conv.append(conv_id)
            rows_idx.append(t)
            rows_role.append(role)
            rows_text.append(text)
            rows_tool.append(tool)
            rows_ts.append(ts)
            ts += int(crng.integers(1_000_000, 60_000_000))

    def perturb_plan(
        plan: list[tuple[str, str, str | None]],
        first_text: str,
        erng: np.random.Generator,
    ) -> list[tuple[str, str, str | None]]:
        """A near-duplicate re-ingestion of the same conversation: the first
        turn gets the jw-band typo signal, other turns get light word noise."""
        out = [(plan[0][0], first_text, plan[0][2])]
        for role, text, tool in plan[1:]:
            if erng.random() < 0.3:
                words = text.split()
                if len(words) > 2:
                    i = int(erng.integers(1, len(words)))
                    words[i] = str(erng.choice(_FILLER))
                    text = " ".join(words)
            out.append((role, text, tool))
        return out

    cluster_sizes = rng.choice(
        np.arange(1, max_cluster + 1),
        size=n_entities,
        p=_cluster_probs(max_cluster),
    )
    for e in range(n_entities):
        ent_id = f"ent-{e:06d}"
        erng = np.random.default_rng(seed * 1_000_003 + e)
        first = _sentence(erng)
        n_tools = int(erng.integers(0, 4))
        tools = list(erng.choice(_TOOLS, size=n_tools, replace=False)) if n_tools else []
        plan = build_turn_plan(first, tools, erng)
        for c in range(int(cluster_sizes[e])):
            if c == 0:
                variant = plan
            else:
                kind = int(erng.integers(0, 4))
                if kind == 0:
                    text = first
                elif kind < 3:
                    # 1-2 char edits: stays in/above the jw cut bands for
                    # sentence-length strings
                    text = _typo(erng, first, n_edits=int(erng.integers(1, 3)))
                else:
                    text = _paraphrase(erng, first)
                variant = perturb_plan(plan, text, erng)
            emit_conversation(
                ent_id, variant, np.random.default_rng(seed * 7_000_003 + conv_counter)
            )

    # hot-block stressor: one giant spam entity — many near-identical
    # boilerplate conversations sharing a blocking key.  (A hot block of
    # *distinct* entities with identical first turns + tool signatures is
    # unresolvable for any Fellegi–Sunter model over these variables — the
    # reference would merge them too — so the stressor tests skew handling
    # with a truth labeling the model can actually achieve.)
    if hot_block_convs:
        boiler = "hello i need help with something please"
        hrng = np.random.default_rng(seed * 9_000_011)
        hot_plan = build_turn_plan(boiler, ["search"], hrng)
        for h in range(hot_block_convs):
            variant = hot_plan if h == 0 else perturb_plan(hot_plan, boiler, hrng)
            emit_conversation(
                "hot-000000",
                variant,
                np.random.default_rng(seed * 9_000_011 + conv_counter + 1),
            )

    turns = pd.DataFrame(
        {
            "conv_id": rows_conv,
            "turn_idx": np.array(rows_idx, dtype=np.int32),
            "role": rows_role,
            "text": rows_text,
            "tool": rows_tool,
            "ts": np.array(rows_ts, dtype="datetime64[us]"),
        }
    )
    if shuffle_rows:
        perm = np.random.default_rng(seed + 1).permutation(len(turns))
        turns = turns.iloc[perm].reset_index(drop=True)
    truth = pd.DataFrame({"conv_id": truth_conv, "entity_id": truth_ent})
    return turns, truth


def _cluster_probs(max_cluster: int) -> np.ndarray:
    raw = np.array([3.0] + [1.0] * (max_cluster - 1))
    return raw / raw.sum()


_FIRST = (
    "james mary robert patricia john jennifer michael linda david elizabeth "
    "william barbara richard susan joseph jessica thomas sarah charles karen "
    "christopher lisa daniel nancy matthew betty anthony margaret mark sandra"
).split()
_LAST_SYL1 = (
    "smith john will brown jone gar mill dav rodri marti her lop gonza wil "
    "ander thom tay moore jack mar lee per white harr san clark ram lew rob"
).split()
_LAST_SYL2 = "son ez man berg ston field wood worth ton ley ford ham er ini".split()
# ~400 distinct surnames: keeps chance full-identity collisions negligible at
# 175k comparisons while still exercising term-frequency skew
_LAST = [a + b for a in _LAST_SYL1 for b in _LAST_SYL2]
_STREET = (
    "main oak pine maple cedar elm washington lake hill park church spring "
    "ridge walnut sunset highland franklin river meadow forest"
).split()
_CITY = (
    "springfield rivertown lakeside hillview oakdale maplewood cedarburg "
    "elmford parkside brookfield"
).split()


def make_person_tables(
    n_a: int = 500,
    n_b: int = 350,
    n_matches: int = 50,
    seed: int = 42,
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Reference-style person tables (dfA, dfB, truth_pairs).

    Columns: firstname, middlename, lastname, housenum, streetname, city,
    birthyear, id (uint64-ish int).  ``truth_pairs``: (id_a, id_b) for the
    planted matches.  Perturbations span the gamma levels: exact copies,
    1-edit typos, +-1/2 housenum offsets, missing fields.
    """
    rng = np.random.default_rng(seed)

    def draw(n: int, id_base: int) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "firstname": rng.choice(_FIRST, size=n),
                "middlename": [
                    chr(ord("a") + int(rng.integers(0, 26)))
                    if rng.random() > 0.3
                    else None
                    for _ in range(n)
                ],
                "lastname": rng.choice(_LAST, size=n),
                "housenum": rng.integers(1, 2000, size=n).astype("int64"),
                "streetname": [
                    f"{rng.choice(_STREET)} {rng.choice(['st', 'ave', 'rd', 'ln'])}"
                    for _ in range(n)
                ],
                "city": rng.choice(_CITY, size=n),
                "birthyear": rng.integers(1930, 2005, size=n).astype("int64"),
                "id": np.arange(id_base, id_base + n, dtype="int64"),
            }
        )

    df_a = draw(n_a, 10_000)
    df_b = draw(n_b, 50_000)

    # plant matches: copy row i of A into slot i of B with perturbations
    match_a = rng.choice(n_a, size=n_matches, replace=False)
    match_b = rng.choice(n_b, size=n_matches, replace=False)
    for ia, ib in zip(match_a, match_b):
        row = df_a.iloc[int(ia)]
        fn, ln, sn = row["firstname"], row["lastname"], row["streetname"]
        hn, by, ct, mn = row["housenum"], row["birthyear"], row["city"], row["middlename"]
        style = int(rng.integers(0, 4))
        if style >= 1:  # typo variants
            if rng.random() < 0.5:
                fn = _typo(rng, fn + "x", 1) if len(fn) > 5 else fn
            if rng.random() < 0.4:
                sn = _typo(rng, sn, 1)
        if style == 2:
            hn = hn + int(rng.integers(-2, 3))
        if style == 3:
            mn = None
        df_b.loc[int(ib), ["firstname", "middlename", "lastname"]] = [fn, mn, ln]
        df_b.loc[int(ib), "housenum"] = hn
        df_b.loc[int(ib), ["streetname", "city"]] = [sn, ct]
        df_b.loc[int(ib), "birthyear"] = by

    # sprinkle missing values outside the planted block
    for df in (df_a, df_b):
        df["housenum"] = df["housenum"].astype("object")
    for col, p in (("firstname", 0.02), ("streetname", 0.02), ("housenum", 0.03)):
        for df in (df_a, df_b):
            mask = rng.random(len(df)) < p
            df.loc[mask, col] = None
    for df in (df_a, df_b):
        df["housenum"] = pd.array(df["housenum"], dtype="Int64")

    truth = pd.DataFrame(
        {
            "id_a": df_a["id"].to_numpy()[match_a],
            "id_b": df_b["id"].to_numpy()[match_b],
        }
    )
    return df_a, df_b, truth


def _name_pool(rng: np.random.Generator, size: int, lo: int, hi: int) -> np.ndarray:
    """Deterministic pool of distinct uppercase pseudo-words."""
    letters = np.array(list("ABCDEFGHIJKLMNOPQRSTUVWXYZ"))
    vowels = np.array(list("AEIOU"))
    seen: set[str] = set()
    out: list[str] = []
    while len(out) < size:
        L = int(rng.integers(lo, hi + 1))
        chars = []
        for i in range(L):
            src = vowels if i % 2 == 1 and rng.random() < 0.7 else letters
            chars.append(str(rng.choice(src)))
        s = "".join(chars)
        if s not in seen:
            seen.add(s)
            out.append(s)
    return np.asarray(out, dtype=object)


def make_ref_benchmark_tables(
    n_a: int = 10_000,
    n_b: int = 10_000,
    seed: int = 1234,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Deterministic tables shaped like the reference's benchmark inputs.

    The reference benchmarks ``fastLink(dfA, dfB, config)`` over two voter
    files with 6 comparison variables that are 3 distinct columns duplicated
    (``src/benchmark.jl:94-101``): FIRST_NAME(1) jarowinkler, MIDDLE_NAME(1)
    exact, STREET_NAME(1) jarowinkler.  Its committed results record the
    pool cardinalities at 10k x 10k (``benchmark.csv:8``): dfA 1204 / 2247 /
    6009 distinct, dfB 900 / 2178 / 4844.  This generator reproduces that
    SHAPE — zipf-weighted draws from shared pools sized so the distinct
    counts land in the same ballpark, ~1.5% planted B-side near-duplicates
    of A rows (typos) so the EM has signal — with no external data.
    """
    rng = np.random.default_rng(seed)
    # (pool size, zipf exponent) tuned so 10k weighted draws yield ~the
    # reference's distinct counts (1204 / 2247 / 6009 on the A side); pools
    # scale with n for smaller test runs
    scale_a = max(n_a / 10_000, 0.2)
    first_pool = _name_pool(rng, max(30, int(2400 * scale_a)), 3, 9)
    mid_pool = _name_pool(rng, max(40, int(3000 * scale_a)), 4, 10)
    street_pool = _name_pool(rng, max(60, int(10500 * scale_a)), 5, 14)

    def draw(pool: np.ndarray, n: int, s: float) -> np.ndarray:
        # zipf-ish weights: heavy head (common names), long tail
        w = 1.0 / np.arange(1, len(pool) + 1, dtype=np.float64) ** s
        w /= w.sum()
        return rng.choice(pool, size=n, p=w)

    def table(n: int, id_base: int) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "TV_ID": np.arange(id_base, id_base + n, dtype="int64"),
                "FIRST_NAME": draw(first_pool, n, 1.15),
                "MIDDLE_NAME": draw(mid_pool, n, 0.85),
                "STREET_NAME": draw(street_pool, n, 0.32),
            }
        )

    df_a = table(n_a, 0)
    df_b = table(n_b, 1_000_000)
    # plant ~1.5% of B as near-duplicates of A rows (the benchmark's voter
    # files share true persons across files)
    n_dup = max(1, int(0.015 * min(n_a, n_b)))
    src = rng.choice(n_a, size=n_dup, replace=False)
    dst = rng.choice(n_b, size=n_dup, replace=False)
    for ia, ib in zip(src, dst):
        row = df_a.iloc[int(ia)]
        fn, mn, sn = row["FIRST_NAME"], row["MIDDLE_NAME"], row["STREET_NAME"]
        if rng.random() < 0.4:
            fn = _typo(rng, fn, 1)
        if rng.random() < 0.3:
            sn = _typo(rng, sn, 1)
        df_b.loc[int(ib), ["FIRST_NAME", "MIDDLE_NAME", "STREET_NAME"]] = [
            fn, mn, sn,
        ]
    # missingness comparable to voter data
    for col, p in (("FIRST_NAME", 0.005), ("MIDDLE_NAME", 0.25), ("STREET_NAME", 0.01)):
        for df in (df_a, df_b):
            mask = rng.random(len(df)) < p
            df.loc[mask, col] = None
    # the duplicated columns (benchmark.jl:99-105)
    for df in (df_a, df_b):
        df["FIRST_NAME1"] = df["FIRST_NAME"]
        df["MIDDLE_NAME1"] = df["MIDDLE_NAME"]
        df["STREET_NAME1"] = df["STREET_NAME"]
    df_b = df_b.rename(columns={"TV_ID": "TS_ID"})
    return df_a, df_b
