"""Payload decode: html BINARY → unicode str.

Analogue of the reference's ``load_image`` channel normalization
(ocrd_calamari/recognize.py:752-785): 1/2/3/4-channel images → the model's
expected channels, with a warning counter when the input is "raw".  Here the
payload is bytes and the normalization is charset handling:

  declared charset (meta tag)  → decode with it
  no/unknown/broken charset    → try utf-8 strict, else latin-1 fallback
                                 and flag ``raw`` (≈ "Using raw image"
                                 warning, recognize.py:147-160, asserted in
                                 test/test_recognize.py:73-75)

latin-1 maps every byte, so decode never hard-fails; genuinely poisoned rows
surface later in segmentation and are handled as error rows
(≈ tf.data ``ignore_errors``, recognize.py:606-609).
"""

from __future__ import annotations

import codecs
import re

# charset sniff over the first 2 KiB, ASCII-compatible superset assumption
_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.IGNORECASE
)
_SNIFF_BYTES = 2048


def sniff_charset(payload: bytes) -> str | None:
    """Return the declared charset name, or None if absent/unusable."""
    m = _META_CHARSET_RE.search(payload[:_SNIFF_BYTES])
    if not m:
        return None
    name = m.group(1).decode("ascii", "replace").strip().lower()
    try:
        codecs.lookup(name)
    except LookupError:
        return None
    return name


def decode_html(payload: bytes) -> tuple[str, bool]:
    """Decode page bytes → (text, raw_fallback_used).

    ``raw_fallback_used`` is True when no (valid) charset was declared and
    strict utf-8 failed — the row decoded through the latin-1 fallback.
    """
    if payload is None:
        return "", False
    charset = sniff_charset(payload)
    if charset is not None:
        try:
            return payload.decode(charset, errors="replace"), False
        except (UnicodeDecodeError, LookupError):  # pragma: no cover - replace never raises
            pass
    try:
        return payload.decode("utf-8"), False
    except UnicodeDecodeError:
        return payload.decode("latin-1"), True
