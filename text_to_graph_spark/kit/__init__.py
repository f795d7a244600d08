"""Pure-Python determinism kit.

Shared by the Spark pandas UDFs *and* the single-process pandas oracle so that
"Spark output == oracle output" is a property of the plan shape, never of the
function bodies. Nothing in here imports pyspark.
"""

from text_to_graph_spark.kit.tokenize import (  # noqa: F401
    count_tokens,
    split_lines,
    split_paragraphs,
    split_sentences,
    text_units,
)
from text_to_graph_spark.kit.sanitize import sanitize  # noqa: F401
from text_to_graph_spark.kit.chunker import pack_units  # noqa: F401
from text_to_graph_spark.kit.htmlcodec import (  # noqa: F401
    extract_text_from_html,
    wrap_text_as_html,
)
from text_to_graph_spark.kit.extract import VocabModel, ProseModel  # noqa: F401
