from .text import (
    TOKEN_CLEAN_RE,
    TOKEN_SPLIT_RE,
    clean_token,
    tokenize,
    tokens_df,
)

__all__ = [
    "TOKEN_CLEAN_RE",
    "TOKEN_SPLIT_RE",
    "clean_token",
    "tokenize",
    "tokens_df",
]
