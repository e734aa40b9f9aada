"""Character-trigram language-ID profiles (Cavnar-Trenkle / Dunning style).

Public-knowledge technique: score a document against per-language
character-trigram log-likelihood profiles and pick the argmax — the
classical statistical LID approach (Cavnar & Trenkle 1994 "N-Gram-Based
Text Categorization"; Dunning 1994 "Statistical Identification of
Language").  The reference engine has no LID; this backs the
training-data-pipeline surface (`raylink.ops.text.with_language_id`)
with a classifier that carries real signal on natural text, unlike the
stopword vote (kept as the cheap screening heuristic).

Profiles are trained at first use from the embedded seed prose below
(original sentences written for this module — everyday + technical
register, a few hundred words per language) and cached per process, so
an actor pays the ~ms build exactly once.  Scoring is fully vectorized:
one UTF-32 codepoint view of the whole batch, one strided trigram
window, one searchsorted into the sorted profile vocabulary, one
``np.add.at`` scatter into the (docs × languages) score matrix — no
per-row Python.

CJK text short-circuits to 'zh' by script detection (the trigram
profiles are Latin-script); documents with no usable signal fall back
to the caller's ``default``.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

__all__ = ["trigram_language_id", "TRIGRAM_LANGS"]

# ---------------------------------------------------------------------------
# seed prose (training). Original text, ~150 words per language, mixing
# everyday and data-engineering register so profiles generalize to both.
# ---------------------------------------------------------------------------

_SEEDS: dict[str, str] = {
    "en": (
        "The morning train was late again, so she read the newspaper on "
        "the platform and watched the rain fall over the old station roof. "
        "Most of the people around her were thinking about work, about the "
        "meetings they could not avoid and the messages they had not "
        "answered. When the system finally loads the data, every table is "
        "split into many small parts and each worker reads only the columns "
        "it needs. This is the heart of the whole design: keep the work "
        "close to the data, send as little as possible over the network, "
        "and let the slowest machine decide nothing. There was bread and "
        "cheese on the table, and the children were already asking whether "
        "they could go outside to play in the garden after dinner. Nobody "
        "knew the answer before the results were written to the report."
    ),
    "fr": (
        "Le train du matin était encore en retard, alors elle a lu le "
        "journal sur le quai en regardant la pluie tomber sur le toit de la "
        "vieille gare. La plupart des gens autour d'elle pensaient au "
        "travail, aux réunions qu'ils ne pouvaient pas éviter et aux "
        "messages restés sans réponse. Quand le système charge enfin les "
        "données, chaque table est découpée en petites parties et chaque "
        "machine ne lit que les colonnes dont elle a besoin. C'est le cœur "
        "de toute la conception : garder le calcul près des données, "
        "envoyer le moins possible sur le réseau, et ne rien laisser "
        "décider à la machine la plus lente. Il y avait du pain et du "
        "fromage sur la table, et les enfants demandaient déjà s'ils "
        "pouvaient aller jouer dans le jardin après le dîner. Personne ne "
        "connaissait la réponse avant que les résultats soient écrits."
    ),
    "de": (
        "Der Zug am Morgen hatte wieder Verspätung, also las sie die "
        "Zeitung auf dem Bahnsteig und sah dem Regen zu, der über das Dach "
        "des alten Bahnhofs fiel. Die meisten Menschen um sie herum dachten "
        "an die Arbeit, an die Besprechungen, die sie nicht vermeiden "
        "konnten, und an die Nachrichten, die sie noch nicht beantwortet "
        "hatten. Wenn das System die Daten endlich lädt, wird jede Tabelle "
        "in viele kleine Teile zerlegt, und jeder Rechner liest nur die "
        "Spalten, die er braucht. Das ist der Kern des ganzen Entwurfs: die "
        "Arbeit nahe bei den Daten halten, so wenig wie möglich über das "
        "Netz schicken und die langsamste Maschine nichts entscheiden "
        "lassen. Auf dem Tisch lagen Brot und Käse, und die Kinder fragten "
        "schon, ob sie nach dem Abendessen draußen im Garten spielen "
        "dürfen. Niemand kannte die Antwort, bevor die Ergebnisse "
        "geschrieben waren."
    ),
    "es": (
        "El tren de la mañana llegó tarde otra vez, así que ella leyó el "
        "periódico en el andén mientras miraba la lluvia caer sobre el "
        "techo de la vieja estación. La mayoría de la gente a su alrededor "
        "pensaba en el trabajo, en las reuniones que no podían evitar y en "
        "los mensajes que no habían contestado. Cuando el sistema por fin "
        "carga los datos, cada tabla se divide en muchas partes pequeñas y "
        "cada máquina lee solo las columnas que necesita. Este es el "
        "corazón de todo el diseño: mantener el trabajo cerca de los "
        "datos, enviar lo menos posible por la red y no dejar que la "
        "máquina más lenta decida nada. Había pan y queso sobre la mesa, y "
        "los niños ya preguntaban si podían salir a jugar al jardín "
        "después de la cena. Nadie conocía la respuesta antes de que los "
        "resultados estuvieran escritos en el informe."
    ),
}

TRIGRAM_LANGS: tuple[str, ...] = tuple(_SEEDS)

# keep lowercase Latin letters (incl. Latin-1 accents + œ) — everything
# else becomes a word boundary so trigrams see ' le ', ' der ', ' los '
_NON_LETTER = re.compile("[^a-zß-öø-ÿœ]+")

_BITS = 10  # codepoints after normalization are < 0x180 < 1024
_MAXCP = np.uint64(1 << _BITS)


def _normalize(texts) -> pd.Series:
    s = pd.Series(texts, dtype="object").fillna("")
    return (
        s.str.lower()
        .str.replace(_NON_LETTER, " ", regex=True)
        .str.strip()
    )


def _trigram_codes(norm: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(codes uint64, doc_idx int64) for every trigram in the batch.

    One UTF-32 view of the '\\x00'-joined batch; windows containing the
    separator or an out-of-range codepoint are dropped.  Each doc is
    padded with a space on both sides so boundary trigrams (' th', 'he ')
    participate — they carry most of the signal.
    """
    padded = norm.map(lambda t: f" {t} " if t else "")
    lens = padded.str.len().to_numpy(np.int64)
    joined = "\x00".join(padded.tolist())
    arr = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(
        np.uint64
    )
    if len(arr) < 3:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    c0, c1, c2 = arr[:-2], arr[1:-1], arr[2:]
    valid = (
        (c0 != 0) & (c1 != 0) & (c2 != 0)
        & (c0 < _MAXCP) & (c1 < _MAXCP) & (c2 < _MAXCP)
    )
    # doc of trigram at position p: docs start at cumulative(len+1)
    starts = np.concatenate([[0], np.cumsum(lens + 1)])[:-1]
    pos = np.nonzero(valid)[0]
    doc_idx = np.searchsorted(starts, pos, side="right") - 1
    codes = (
        (c0[pos] << np.uint64(2 * _BITS))
        | (c1[pos] << np.uint64(_BITS))
        | c2[pos]
    )
    return codes, doc_idx


_PROFILE: tuple[np.ndarray, np.ndarray] | None = None


def _profile() -> tuple[np.ndarray, np.ndarray]:
    """(sorted trigram codes (T,), logp (L, T+1)) — column T is the
    per-language unseen-trigram backoff (add-half smoothing)."""
    global _PROFILE
    if _PROFILE is None:
        per_lang: list[dict[int, int]] = []
        vocab: set[int] = set()
        for lang in TRIGRAM_LANGS:
            codes, _ = _trigram_codes(_normalize([_SEEDS[lang]]))
            u, c = np.unique(codes, return_counts=True)
            per_lang.append(dict(zip(u.tolist(), c.tolist())))
            vocab.update(u.tolist())
        sorted_codes = np.array(sorted(vocab), dtype=np.uint64)
        t = len(sorted_codes)
        logp = np.empty((len(TRIGRAM_LANGS), t + 1), dtype=np.float32)
        for i, counts in enumerate(per_lang):
            vec = np.full(t + 1, 0.5, dtype=np.float64)
            if counts:
                ks = np.array(sorted(counts), dtype=np.uint64)
                vec[np.searchsorted(sorted_codes, ks)] += np.array(
                    [counts[int(k)] for k in ks], dtype=np.float64
                )
            logp[i] = np.log(vec / vec.sum()).astype(np.float32)
        _PROFILE = (sorted_codes, logp)
    return _PROFILE


def trigram_language_id(texts, default: str = "und") -> np.ndarray:
    """Language guess among {en, fr, de, es, zh} from character-trigram
    log-likelihood; ``default`` for documents with tokens but no scorable
    trigrams, 'und' for empty/null documents.

    Ties and genuinely ambiguous text resolve to the highest-likelihood
    profile; CJK-dominant documents short-circuit to 'zh' by script.
    """
    from .textstats import cjk_dominant

    s = pd.Series(texts, dtype="object").fillna("")
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=object)
    is_zh = cjk_dominant(s)

    norm = _normalize(s)
    codes, doc_idx = _trigram_codes(norm)
    sorted_codes, logp = _profile()
    t = len(sorted_codes)
    scores = np.zeros((n, logp.shape[0]), dtype=np.float64)
    if len(codes):
        pos = np.searchsorted(sorted_codes, codes)
        pos_c = np.minimum(pos, t - 1)
        col = np.where(
            (pos < t) & (sorted_codes[pos_c] == codes), pos, t
        )
        np.add.at(scores, doc_idx, logp[:, col].T)

    langs = np.array(TRIGRAM_LANGS, dtype=object)
    out = langs[scores.argmax(axis=1)].astype(object)
    scored = np.zeros(n, dtype=bool)
    if len(codes):
        scored[np.unique(doc_idx)] = True
    # same contract as textstats.language_id: empty / whitespace-only
    # documents (no tokens) are always 'und'; documents WITH tokens but
    # no scorable trigrams get the caller's `default`
    has_tokens = s.str.contains(r"\S", regex=True).to_numpy(bool)
    out[~scored & has_tokens] = default
    out[~has_tokens] = "und"
    out[is_zh] = "zh"
    return out
