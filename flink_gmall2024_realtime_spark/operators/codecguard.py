"""Malformed-input boundary for the byte-level decoders.

Crawl-scale corpora contain garbage: truncated shards, bit-flipped
payloads, mislabeled files. Every decoder in this repo documents a
``ValueError`` (malformed) / ``NotImplementedError`` (out-of-scope)
contract; internally, corruption naturally surfaces as IndexError /
KeyError / struct.error / zlib.error / UnicodeDecodeError at whatever
offset the walk went wrong. This decorator converts those — and ONLY
those mechanical corruption signatures — into ``ValueError`` with the
original context chained, so a driver's per-row error handling can rely
on the documented types (fuzz property:
``tests/test_properties.py::test_decoders_raise_only_documented_errors``).
"""

from __future__ import annotations

import functools
import struct
import zlib

_CORRUPTION = (
    IndexError,
    KeyError,
    TypeError,
    AttributeError,
    OverflowError,
    EOFError,
    UnicodeDecodeError,
    struct.error,
    zlib.error,
)


def malformed_guard(fn):
    """Wrap a decoder entry point: unexpected mechanical exceptions from
    walking corrupt bytes become ValueError (context chained)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except (ValueError, NotImplementedError):
            raise
        except _CORRUPTION as e:
            raise ValueError(
                f"malformed payload in {fn.__name__}: {type(e).__name__}: {e}"
            ) from e

    return wrapper
