"""Pipeline configuration — the ``PageConfigurationData`` analogue.

The reference configures the engine with a builder of psm/ppi plus a freeform
``Map<String,String>`` of engine variables
(src/org/dharts/dia/tesseract/PageConfigurationData.java:35-131,
``TesseractHandle.setVariable`` TesseractHandle.java:168-177).  Here the whole
configuration is a frozen dataclass fixed at actor construction time, which
designs out the reference's global-parameter thread hazard
(ImageAnalyzerFactory.java:106-116): a Ray actor pool never mutates shared
engine state after init.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Mode:
    """Segmentation mode — PageSegMode analogue (PublicTypes.java:66-120).

    * ``AUTO``       — full DOM block segmentation (PSM_AUTO).
    * ``SINGLE_BLOCK`` — treat the whole document as one flowing-text block
      (PSM_SINGLE_BLOCK).
    * ``TEXT_ONLY``  — trust the corpus-provided ``text`` column, skip HTML
      parsing entirely (no OCR analogue; the "already recognized" path).
    """

    AUTO = "auto"
    SINGLE_BLOCK = "single_block"
    TEXT_ONLY = "text_only"


@dataclass(frozen=True)
class ExtractConfig:
    """Deterministic extraction parameters.

    Every field must be hashable/serializable — the config rides to the
    actors inside the ``map_batches`` fn-constructor args.
    """

    mode: str = Mode.AUTO
    # Region-of-interest: restrict extraction to content inside this tag
    # (analyzeLayout(Rectangle) analogue, ImageAnalyzer.java:76).  None = whole
    # document.  Offsets are relative to the ROI extraction's own text (a
    # documented divergence from the reference, which keeps full-image coords).
    selector_tag: str | None = None
    # Character whitelist/blacklist (tessedit_char_whitelist/-blacklist
    # analogue, TesseractHandle.java:150-177 + tessdata/configs/digits).
    char_whitelist: str | None = None
    char_blacklist: str | None = None
    # A text paragraph whose link density exceeds this is classified NOISE
    # (boilerplate) and excluded from the extracted text.
    max_link_density: float = 0.5
    # Paragraphs with at least this many words survive a slightly higher
    # link density (long link-rich paragraphs are often legitimate content).
    long_para_words: int = 25
    long_para_max_link_density: float = 0.65
    # Emit spans below block level (para/line/word rows).
    emit_word_spans: bool = True

    # freeform passthrough, the setVariable analogue; values must be str.
    variables: tuple = field(default_factory=tuple)

    def get_variable(self, name: str, default: str | None = None) -> str | None:
        """Typed readback analogue (TesseractHandle.getVariable, :224-259)."""
        for k, v in self.variables:
            if k == name:
                return v
        return default
