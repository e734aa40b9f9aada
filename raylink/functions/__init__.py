from . import gamma, hashing, soundex, strdist  # noqa: F401
