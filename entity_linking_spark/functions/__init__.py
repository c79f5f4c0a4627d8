from entity_linking_spark.functions.normalize import (  # noqa: F401
    basic_tokenize,
    clean_text,
    normalize_text,
    tokenize_udf,
    normalize_udf,
)
