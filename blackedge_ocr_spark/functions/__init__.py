from blackedge_ocr_spark.functions.text import (  # noqa: F401
    extract_numbers,
    key_terms,
    normalize_for_comparison,
    normalize_text,
    py_strip,
    remove_page_breaks,
    tokens,
    word_count,
    word_frequency,
)
from blackedge_ocr_spark.functions.problems import (  # noqa: F401
    problem_flags,
    problems_array,
)
from blackedge_ocr_spark.functions.similarity import (  # noqa: F401
    levenshtein_similarity,
    multiset_cosine_arrow,
    number_frequency_similarity,
    similarity_by_method,
    similarity_report,
    word_overlap_similarity,
    wordfreq_cosine_similarity,
)
