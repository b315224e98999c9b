"""File-format kernels, object-store protocol, versions, and CSE-KMS."""

from __future__ import annotations


def check_redact_columns(redact_columns: list | None) -> None:
    """The single redact-mode contract check, shared by both file
    kernels and the Forget plan entries: ``None`` = delete mode, a
    NON-EMPTY list = redact mode. An explicit ``[]`` would
    truthiness-fall-through to "keep the row, redact nothing" while
    still counting it deleted — never what the caller meant."""
    if redact_columns is not None and not redact_columns:
        raise ValueError(
            "redact_columns=[] is ambiguous: pass None for delete mode "
            "or a non-empty column list for redact mode"
        )
