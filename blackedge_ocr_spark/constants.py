"""Engine-wide constants.

Semantic parity targets are cited as ``reference:file:line`` into
/root/reference (avichay-be/Blackedge-OCR). Values are re-declared
here from the published behavior of that reference — no code is
copied; these are the observable constants of its data model.
"""

# Joined-document page separator (reference: src/core/constants.py:16).
CONTENT_SEPARATOR = "\n---PAGE-BREAK---\n"

# Page-break marker variants stripped by remove_page_breaks
# (reference: src/services/validation/content_normalizer.py:188-191).
PAGE_BREAK_MARKERS = ("---PAGE-BREAK---", "---PAGE BREAK---", "[PAGE BREAK]")

# Problem-detector thresholds
# (reference: src/services/validation/problem_detector.py:27-30).
MIN_CONTENT_LENGTH = 100
MAX_REPEATED_CHAR_LENGTH = 10
MIN_WORD_COUNT = 20
MAX_GIBBERISH_RATIO = 0.3

# Fixed evaluation order of the ten quality checks
# (reference: src/services/validation/problem_detector.py:85-124).
PROBLEM_LABELS = (
    "low_content_density",
    "missing_numbers",
    "repeated_characters",
    "low_word_count",
    "high_gibberish",
    "suspicious_characters",
    "incomplete_tables",
    "excessive_whitespace",
    "encoding_issues",
    "missing_punctuation",
)

# Mojibake markers (reference: src/services/validation/problem_detector.py:301-307).
ENCODING_ERROR_MARKERS = ("â€™", "â€œ", "â€", "Ã©", "Ã¨")

# Levenshtein guards
# (reference: src/services/validation/similarity_calculator.py:197,326).
LEVENSHTEIN_TRUNCATE = 10000
LEVENSHTEIN_REPORT_MAX = 5000

# Validation decision defaults — the served path constructs
# ValidationService directly, so the class defaults apply
# (reference: src/services/validation/validation_service.py:33-48;
# the settings-based 0.95 accessor at :254-290 is never used by the
# handlers — documented mismatch, we follow the served path).
SIMILARITY_METHOD = "number_frequency"
SIMILARITY_THRESHOLD = 0.85

# Workflow names (reference: src/workflows/workflow_types.py:22-26).
WF_MISTRAL = "mistral"
WF_TEXT = "text_extraction"
WF_AZURE = "azure_di"
WF_OCR = "ocr_images"
WF_GEMINI = "gemini"
WORKFLOWS = (WF_MISTRAL, WF_TEXT, WF_AZURE, WF_OCR, WF_GEMINI)

# Explicit-workflow aliases (reference: src/workflows/workflow_types.py:44-53).
WORKFLOW_ALIASES = {
    "default": WF_MISTRAL,
    "text": WF_TEXT,
    "azure_di": WF_AZURE,
    "azure-di": WF_AZURE,
    "azuredi": WF_AZURE,
    "azure": WF_AZURE,
    "ocr": WF_OCR,
    "ocr_images": WF_OCR,
    "mistral": WF_MISTRAL,
    "text_extraction": WF_TEXT,
    "gemini": WF_GEMINI,
}

# Priority-ordered routing keyword lists
# (reference: src/services/workflow_router.py:69-121).
TEXT_EXTRACTION_KEYWORDS = (
    "text extraction", "text only", "pdfplumber", "no ai",
    "raw text", "simple extraction", "plain text",
)
AZURE_DI_KEYWORDS = (
    "azure di", "azure document intelligence", "document intelligence",
    "smart tables", "table extraction", "form", "invoice",
    "structured document", "layout",
)
OCR_KEYWORDS = (
    "ocr", "images", "charts", "diagrams", "scanned", "scan",
    "handwritten", "visual content", "image extraction",
)
GEMINI_KEYWORDS = (
    "gemini", "google", "high quality", "best quality", "maximum quality",
)

# Primary provider per workflow. ocr_images serves the reference's
# Mistral fallback ("vision support pending",
# reference: src/services/workflows/ocr_images_handler.py:99-124).
PRIMARY_PROVIDER = {
    WF_MISTRAL: "mistral",
    WF_TEXT: "pdfplumber",
    WF_AZURE: "azure_di",
    WF_OCR: "mistral",
    WF_GEMINI: "gemini",
}

# Secondary (cross-validation) provider per workflow
# (reference: default_handler.py:107 → openai,
#  azure_di_handler.py:115 → mistral, gemini_handler.py:109 → mistral).
# text_extraction never validates (text_extraction_handler.py:45-94);
# ocr_images requests validation but the reference skips it
# (ocr_images_handler.py:131-133) — we preserve that.
SECONDARY_PROVIDER = {
    WF_MISTRAL: "openai",
    WF_AZURE: "mistral",
    WF_GEMINI: "mistral",
}

# Workflows for which enable_validation actually validates.
VALIDATING_WORKFLOWS = (WF_MISTRAL, WF_AZURE, WF_GEMINI)

# Span kinds (FIXTURES.md §1): text/table carry text; image/page are
# media spans carrying an opaque media_ref.
TEXT_KINDS = ("text", "table")
MEDIA_KINDS = ("image", "page")
