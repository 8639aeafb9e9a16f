"""Engine configuration.

Mirrors the reference's JSON-schema parameter block
(reference: ocrd_calamari/ocrd-tool.json:17-50):

    device:int, checkpoint_dir:uri, voter:enum, textequiv_level:enum,
    glyph_conf_cutoff:float

``device``/``checkpoint_dir`` have no analogue here (extractors are CPU
heuristic "models", registered in kernel/vote.py — the analogue of globbing
``*.ckpt.json``, reference recognize.py:510-511).
"""

from __future__ import annotations

from dataclasses import dataclass, field

VOTERS = ("confidence_voter_default_ctc", "sequence_voter")
LEVELS = ("block", "word", "glyph")  # ≈ textequiv_level {line, word, glyph}

# Block-level "tiny segment" filter: the analogue of the reference's skip of
# lines with height<=8 / width<=8 / all-background (recognize.py:166-179).
MIN_VISIBLE_CHARS = 8


@dataclass(frozen=True)
class ExtractConfig:
    """Validated, immutable engine parameters.

    Validation replaces the reference's CLI JSON-schema check
    (ocrd_calamari/cli.py:7-13).
    """

    voter: str = "confidence_voter_default_ctc"
    textequiv_level: str = "block"
    glyph_conf_cutoff: float = 0.001  # reference default, ocrd-tool.json:44-49
    accept_threshold: float = 0.5  # fused-vote acceptance bar
    min_visible_chars: int = MIN_VISIBLE_CHARS
    extractors: tuple = field(
        default=("density", "link_density", "readability")
    )  # ≈ 5-fold checkpoint ensemble, ocrd-tool.json:65

    def __post_init__(self):
        if self.voter not in VOTERS:
            raise ValueError(f"voter must be one of {VOTERS}, got {self.voter!r}")
        if self.textequiv_level not in LEVELS:
            raise ValueError(
                f"textequiv_level must be one of {LEVELS}, got {self.textequiv_level!r}"
            )
        # The reference applies the cutoff only to ranked glyph alternatives
        # (recognize.py:243-247) but *reads* the top-1 char through the same
        # filter in the whitespace ops (recognize.py:254); a cutoff >= the
        # primary probability floor would crash it.  We fail fast instead.
        if not (0.0 <= self.glyph_conf_cutoff < 0.5):
            raise ValueError("glyph_conf_cutoff must be in [0, 0.5)")
        if not (0.0 <= self.accept_threshold <= 1.0):
            raise ValueError("accept_threshold must be in [0, 1]")
