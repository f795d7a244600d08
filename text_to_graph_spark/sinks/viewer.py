"""Standalone HTML graph-viewer export — the reference's S8 sink.

The reference renders each finished graph into a self-contained HTML file:
nodes/edges/metadata CSV strings are zlib-compressed, base64-encoded and
injected into template placeholders
(``graph_extractor/src/create_graph_viewer.py:12-44``; decode side
``webpages/standalone_graph_viewer/template/dev/data/data.js:1-11``), with
backslash/backtick escaping plus HTML escaping on the way in
(``create_graph_viewer.py:28-30``).

This module reproduces the *sink contract* — CSV -> zlib -> base64 ->
placeholder injection, same escaping discipline — against our own minimal
template (the reference's viewer blob is its own artifact; we only need the
payload format). At corpus scale the product is the Iceberg ``nodes`` /
``edges`` tables (S7); this sink is a driver-side export for viewer-sized
subgraphs, fed by ``operators.graphq.filter_subgraph`` which already applies
the 1500-edge render cap. The only ``collect()`` in the repo lives here, on
a capped result, by design.

CSV headers match the viewer's parser expectation after the reference's P5
renames: nodes ``id,label,type`` (type = '|'-joined sorted set,
``graph_utils.py:68``), edges ``source,target,label``; dense 0..N-1 node ids
are materialized export-time only (``with_dense_export_ids``).
"""

from __future__ import annotations

import base64
import html as _html
import io
import zlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from text_to_graph_spark.operators.canonicalize import (
    render_type_set,
    with_dense_export_ids,
)

NODES_PLACEHOLDER = "__T2G_NODES_B64__"
EDGES_PLACEHOLDER = "__T2G_EDGES_B64__"
META_PLACEHOLDER = "__T2G_META_B64__"

# minimal self-contained template: decodes the payload with the browser's
# native DecompressionStream('deflate') — no bundled JS library needed.
_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>graph</title></head>
<body><pre id="out">loading…</pre><script>
const payload = {
  nodes: `__T2G_NODES_B64__`,
  edges: `__T2G_EDGES_B64__`,
  meta: `__T2G_META_B64__`,
};
async function inflate(b64) {
  const bytes = Uint8Array.from(atob(b64), c => c.charCodeAt(0));
  const ds = new DecompressionStream('deflate');
  const stream = new Blob([bytes]).stream().pipeThrough(ds);
  return await new Response(stream).text();
}
(async () => {
  const nodes = await inflate(payload.nodes);
  const edges = await inflate(payload.edges);
  const meta = await inflate(payload.meta);
  document.getElementById('out').textContent =
    meta + '\\n\\n' + nodes + '\\n\\n' + edges;
})();
</script></body></html>
"""


def compress_and_encode(text: str) -> str:
    """CSV string -> zlib -> base64 ascii (``create_graph_viewer.py:15-17``)."""
    return base64.b64encode(zlib.compress(text.encode("utf-8"))).decode("ascii")


def decode_payload(b64: str) -> str:
    """Inverse (the viewer's data.js decode) — used by tests to round-trip."""
    return zlib.decompress(base64.b64decode(b64)).decode("utf-8")


def _escape(b64: str) -> str:
    """Backslash + backtick escaping, then HTML escaping, matching the
    injection discipline of ``create_graph_viewer.py:28-30``."""
    return _html.escape(b64.replace("\\", "\\\\").replace("`", "\\`"))


def doc_index_table(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Dense 0..D-1 document indices over every doc id referenced by the
    export, ordered by doc id asc (the deterministic stand-in for the
    reference's file-selection order, ``graph_generator.py:424-460``).
    Export-time only — the single-partition window is bounded by the
    viewer-capped subgraph size."""
    from pyspark.sql import Window

    docs = (
        nodes.select(F.explode("doc_ids").alias("doc"))
        .unionByName(edges.select(F.explode("doc_ids").alias("doc")))
        .distinct()
    )
    w = Window.orderBy("doc")
    return docs.withColumn("doc_index", F.row_number().over(w) - 1)


def _with_provenance_suffix(
    df: DataFrame, key_cols: list[str], label_col: str, doc_map: DataFrame
) -> DataFrame:
    """Append the reference's composite-graph provenance suffix to a label:
    ``label|i1|i2|...`` with sorted doc indices (``graph_utils.py:220-221,
    236-245``; the viewer splits it back at ``utils.js:62-78``)."""
    ex = df.select(*key_cols, F.explode("doc_ids").alias("doc"))
    prov = (
        ex.join(F.broadcast(doc_map), "doc")
        .groupBy(*key_cols)
        .agg(
            F.concat_ws("|", F.array_sort(F.collect_set("doc_index"))).alias(
                "_prov"
            )
        )
    )
    return (
        df.join(prov, key_cols)
        .withColumn(label_col, F.concat_ws("|", F.col(label_col), F.col("_prov")))
        .drop("_prov")
    )


def assert_unique_node_labels(nodes: DataFrame, label_col: str = "label") -> None:
    """P11's hard error: the viewer aborts on duplicate node labels
    (``data_renderer.js:224-232``). Checked on the base label (the viewer
    strips the provenance suffix before sanitizing)."""
    dup = (
        nodes.groupBy(F.lower(F.col(label_col)).alias("l"))
        .count()
        .where(F.col("count") > 1)
        .limit(5)
        .collect()
    )
    if dup:
        raise ValueError(
            "duplicate node labels in viewer export: "
            + ", ".join(r["l"] for r in dup)
        )


def render_csvs(
    nodes: DataFrame, edges: DataFrame, provenance: bool = False
) -> tuple[str, str]:
    """Canonical nodes/edges -> the viewer's CSV wire format.

    Node ids are densified 0..N-1 (insertion order made total: key asc);
    edge endpoints are remapped through the id table with two broadcast
    joins (the reference's ``entity_id_map`` remap, ``graph_utils.py:47-59``).
    P11 sanitation runs on the way out: null/empty labels and types drop,
    edges with unmapped endpoints drop (the inner joins), and duplicate
    node labels are a hard error. With ``provenance=True`` both labels carry
    the reference's ``|docIdx`` suffix derived from the ``doc_ids`` arrays.
    """
    nodes = nodes.where(
        F.col("label").isNotNull() & (F.length("label") > 0) & (F.size("types") > 0)
    )
    assert_unique_node_labels(nodes)
    if provenance:
        doc_map = doc_index_table(nodes, edges).localCheckpoint(eager=True)
        nodes = _with_provenance_suffix(nodes, ["key"], "label", doc_map)
        edges = _with_provenance_suffix(
            edges, ["subj_key", "pred_key", "obj_key"], "pred_label", doc_map
        )
    n = with_dense_export_ids(nodes, order_col="key").select(
        "id", "key", F.col("label"), render_type_set(F.col("types")).alias("type")
    )
    id_map = n.select("key", "id")
    edges = edges.where(
        F.col("pred_label").isNotNull() & (F.length("pred_label") > 0)
    )
    e = (
        edges.join(
            F.broadcast(id_map.withColumnRenamed("key", "subj_key")).withColumnRenamed(
                "id", "source"
            ),
            "subj_key",
        )
        .join(
            F.broadcast(id_map.withColumnRenamed("key", "obj_key")).withColumnRenamed(
                "id", "target"
            ),
            "obj_key",
        )
        .select("source", "target", F.col("pred_label").alias("label"))
        .orderBy("source", "target", "label")
    )
    npdf: pd.DataFrame = n.select("id", "label", "type").orderBy("id").toPandas()
    epdf: pd.DataFrame = e.toPandas()
    nbuf, ebuf = io.StringIO(), io.StringIO()
    npdf.to_csv(nbuf, index=False)
    epdf.to_csv(ebuf, index=False)
    return nbuf.getvalue(), ebuf.getvalue()


def render_doc_metadata(nodes: DataFrame, edges: DataFrame) -> str:
    """Composite-run metadata: the doc-index map as JSON, the analog of the
    reference's per-document ``{index, filename, sha256}`` rows
    (``graph_generator.py:391-395,424-460``)."""
    import json

    rows = doc_index_table(nodes, edges).orderBy("doc_index").collect()
    return json.dumps(
        [{"index": r["doc_index"], "doc": r["doc"]} for r in rows]
    )


def build_viewer_html(
    nodes: DataFrame,
    edges: DataFrame,
    metadata: str | None = None,
    provenance: bool = False,
) -> str:
    """Full S8 sink: capped subgraph DataFrames -> standalone HTML string.

    ``provenance=True`` renders the reference's composite-graph export:
    ``label|docIdx...`` suffixes on node and edge labels plus the doc-index
    map in the metadata payload."""
    if metadata is None:
        metadata = render_doc_metadata(nodes, edges) if provenance else "{}"
    nodes_csv, edges_csv = render_csvs(nodes, edges, provenance=provenance)
    out = _TEMPLATE
    out = out.replace(NODES_PLACEHOLDER, _escape(compress_and_encode(nodes_csv)))
    out = out.replace(EDGES_PLACEHOLDER, _escape(compress_and_encode(edges_csv)))
    out = out.replace(META_PLACEHOLDER, _escape(compress_and_encode(metadata)))
    return out


def write_viewer_html(
    nodes: DataFrame,
    edges: DataFrame,
    path: str,
    metadata: str | None = None,
    provenance: bool = False,
) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write(build_viewer_html(nodes, edges, metadata, provenance=provenance))
