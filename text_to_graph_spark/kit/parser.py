"""CSV-contract response parser — reference-parity compatibility path.

Reproduces ``graph_extractor/src/response_parser.py:10-207`` semantics so the
engine can ingest raw extractor output in the reference's wire format (two
CSV tables). With the deterministic models we emit structs directly and skip
this, but it is kept (and golden-tested against the reference's own inline
fixture texts) to prove contract parity:

- section state machine on headers ``id,entity,category`` /
  ``source,target,relationship``; ``#`` and ``\\`\\`\\``` lines skipped
  (``response_parser.py:22-39``)
- per-row field-count validation with ``csv``-module quoting
  (``response_parser.py:119-144``)
- duplicate node ids reject the whole response (``response_parser.py:59-61``)
- column renames entity->label, category->type, relationship->label
  (``response_parser.py:91-97``)
- edge dedup on (source,target,label) (``response_parser.py:102``)
- orphan-node removal + dense 0..N-1 reindex (``response_parser.py:178-207``)
"""

from __future__ import annotations

import csv
import io

import pandas as pd

NODE_HEADER = ["id", "entity", "category"]
EDGE_HEADER = ["source", "target", "relationship"]


def _validate_csv_rows(lines: list[str], expected_cols: list[str]) -> list[str] | None:
    if not lines:
        return None
    header_fields = lines[0].strip().split(",")
    if len(header_fields) != len(expected_cols):
        return None
    valid = [lines[0]]
    for line in lines[1:]:
        stripped = line.strip()
        if not stripped:
            continue
        fields = next(csv.reader([stripped], skipinitialspace=True))
        if len(fields) != len(expected_cols):
            continue
        valid.append(stripped)
    return valid


def parse_response_text(text: str) -> tuple[pd.DataFrame | None, pd.DataFrame | None]:
    """Parse one extractor response into (nodes, edges) DataFrames.

    Returns (None, None) on hard rejects, mirroring the reference contract.
    Node frame is indexed by dense id with columns [label, type]; edge frame
    has columns [source, target, label].
    """
    lines = text.splitlines()
    if not lines:
        return pd.DataFrame(), pd.DataFrame()

    nodes_lines: list[str] = []
    edges_lines: list[str] = []
    in_nodes = in_edges = False
    for line in lines:
        line = line.strip()
        if not line:
            continue
        if line.startswith("id,entity,category"):
            in_nodes, in_edges = True, False
            nodes_lines.append(line)
        elif line.startswith("source,target,relationship"):
            in_nodes, in_edges = False, True
            edges_lines.append(line)
        elif line.startswith("#") or line.startswith("```"):
            continue
        elif in_nodes:
            nodes_lines.append(line)
        elif in_edges:
            edges_lines.append(line)

    nodes_df = pd.DataFrame(columns=["id", "entity", "category"])
    edges_df = pd.DataFrame(columns=["source", "target", "relationship"])

    if nodes_lines:
        valid = _validate_csv_rows(nodes_lines, NODE_HEADER)
        if valid is None or len(valid) <= 1:
            return None, None
        try:
            nodes_df = pd.read_csv(io.StringIO("\n".join(valid)))
        except Exception:
            return None, None
        if nodes_df["id"].duplicated().any():
            return None, None
        if not nodes_df["id"].apply(lambda x: isinstance(x, (int, str))).all():
            return None, None
        nodes_df = nodes_df.set_index("id")

    if edges_lines:
        valid = _validate_csv_rows(edges_lines, EDGE_HEADER)
        if valid is None or len(valid) <= 1:
            return nodes_df.rename(columns={"entity": "label", "category": "type"}), None
        try:
            edges_df = pd.read_csv(io.StringIO("\n".join(valid)))
        except Exception:
            return nodes_df.rename(columns={"entity": "label", "category": "type"}), None

    nodes_df = nodes_df.rename(columns={"entity": "label", "category": "type"})
    edges_df = edges_df.rename(columns={"relationship": "label"})
    edges_df = edges_df.drop_duplicates(subset=["source", "target", "label"])

    return remove_orphan_nodes_and_reindex(nodes_df, edges_df)


def remove_orphan_nodes_and_reindex(
    nodes_df: pd.DataFrame | None, edges_df: pd.DataFrame | None
) -> tuple[pd.DataFrame | None, pd.DataFrame | None]:
    """Drop nodes unreferenced by any edge; remap ids densely to 0..N-1
    (``response_parser.py:178-207``)."""
    if nodes_df is None or edges_df is None:
        return nodes_df, edges_df
    if "source" not in edges_df.columns or "target" not in edges_df.columns:
        return nodes_df, edges_df

    referenced = set(edges_df["source"].unique()) | set(edges_df["target"].unique())
    orphans = set(nodes_df.index) - referenced
    cleaned_nodes = nodes_df.drop(index=orphans, errors="ignore").copy()

    old_to_new = {old: new for new, old in enumerate(cleaned_nodes.index)}
    cleaned_nodes["id"] = cleaned_nodes.index.map(old_to_new)
    cleaned_nodes = cleaned_nodes.set_index("id")

    cleaned_edges = edges_df.copy()
    cleaned_edges["source"] = cleaned_edges["source"].map(old_to_new).astype(int)
    cleaned_edges["target"] = cleaned_edges["target"].map(old_to_new).astype(int)
    return cleaned_nodes, cleaned_edges


def parse_mention_list(response: str | None) -> list[str] | None:
    """Parse the L1 comma-separated quoted entity list
    (``response_parser.py:147-175``)."""
    if not isinstance(response, str):
        return None
    response = response.strip()
    if not response:
        return None
    reader = csv.reader(io.StringIO(response), skipinitialspace=True)
    entities = next(reader, None)
    if entities is None:
        return None
    entities = [e.strip() for e in entities if e.strip()]
    return entities or None
