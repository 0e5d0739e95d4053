"""Physical-plan capture and parsing for lineage tracking.

Reference: /root/reference/jorvik/data_lineage/execution_plan.py:11-180.
Captures ``df.explain('formatted')`` output and rebuilds it as a tree of
:class:`PlanNode` so leaf scan nodes (the data sources) can be classified.

The formatted explain text has two sections separated by a blank double
line: the indented operator tree, then per-node detail blocks
(``(id) NodeName`` followed by ``Key: value`` lines).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from pyspark.sql import DataFrame

_SECTION_HEADER = re.compile(r"^\s*==\s*[^=]+\s*==\s*$")
_NODE_ID = re.compile(r"\((\d+)\)")
# Dots/underscores included: catalog-table scans render as
# "Scan parquet spark_catalog.default.tbl (1)" and the qualified name is
# part of the node name — without them the match starts after the last
# dot and the scan is misclassified as unknown.
_NODE_NAME = re.compile(r"[a-zA-Z0-9][a-zA-Z0-9._\s]*?(?=\s*\()")
_INDENT_WIDTH = 3


@dataclass
class PlanNode:
    """One operator of the physical plan tree."""

    id: Optional[int]
    name: Optional[str]
    height: int
    properties: Dict[str, str] = field(default_factory=dict)
    children: List["PlanNode"] = field(default_factory=list)

    @property
    def leaves(self) -> List["PlanNode"]:
        """All descendants without children (depth-first order)."""
        if not self.children:
            return [self]
        out: List[PlanNode] = []
        for child in self.children:
            out.extend(child.leaves)
        return out

    def render(self, level: int = 0, with_properties: bool = False) -> str:
        lines = ["  " * level + f"{self.name} ({self.id})"]
        if with_properties:
            lines += [
                "  " * (level + 1) + f"{k}: {v}"
                for k, v in self.properties.items()
            ]
        for child in self.children:
            lines.append(child.render(level + 1, with_properties))
        return "\n".join(lines)


# Keep the reference's public type name available for parity.
ExecutionNode = PlanNode


def capture_explain(df: DataFrame) -> str:
    """Return ``df.explain('formatted')`` output as a string (the PySpark
    API only prints it — reference execution_plan.py:56-71).

    Taken from the JVM queryExecution directly, NOT via
    ``contextlib.redirect_stdout`` around ``df.explain()``: that redirect
    swaps ``sys.stdout`` process-wide, and this capture runs on an
    abandonable watchdog thread (observer.py) — a capture that outlives
    its timeout would leave the whole application printing into an
    orphaned buffer, and any concurrent thread's prints would corrupt
    the captured plan text.
    """
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def split_formatted_explain(explain_result: str) -> tuple:
    """Split into (tree section, node-details section)."""
    parts = explain_result.split("\n\n\n")
    return parts[0], (parts[1] if len(parts) > 1 else "")


def parse_node_line(line: str) -> tuple:
    """Extract ``(id, name)`` from one tree line, e.g.
    ``'* ShuffleQueryStage (11), Statistics(...)'`` → ``(11, 'ShuffleQueryStage')``."""
    id_match = _NODE_ID.search(line)
    name_match = _NODE_NAME.search(line)
    return (
        int(id_match.group(1)) if id_match else None,
        name_match.group(0).strip() if name_match else None,
    )


def _indent_of(line: str) -> int:
    stripped = re.sub(r"[+\-:]", " ", line)
    return (len(stripped) - len(stripped.lstrip())) // _INDENT_WIDTH


def parse_node_details(details_section: str) -> Dict[int, Dict[str, str]]:
    """Parse ``(id) Name`` blocks into id → {key: value}. A ``+-`` line
    marks a nested cached plan — stop there (reference behavior)."""
    out: Dict[int, Dict[str, str]] = {}
    for block in details_section.split("\n\n"):
        block = block.strip("\n")
        if not block.strip():
            continue
        lines = block.split("\n")
        head = lines[0].split(" ")[0]
        try:
            node_id = int(head.strip("()"))
        except ValueError:
            continue
        props: Dict[str, str] = {}
        for line in lines[1:]:
            if line.startswith("+-"):
                break
            if ":" not in line:
                continue
            key, value = line.split(":", 1)
            props[key.strip()] = value.strip()
        out[node_id] = props
    return out


def build_execution_tree(explain_result: str) -> PlanNode:
    """Rebuild the operator tree: parent/child from indentation, properties
    joined from the details section. Multiple roots raise (reference
    execution_plan.py:164-179)."""
    tree_section, details_section = split_formatted_explain(explain_result)
    details = parse_node_details(details_section)

    root: Optional[PlanNode] = None
    stack: List[PlanNode] = []
    for line in tree_section.split("\n"):
        # Strip tree-drawing markers first: "+- == Initial Plan ==" is a
        # section header too, but only after cleaning.
        cleaned = re.sub(r"[+\-:]", " ", line)
        if not cleaned.strip() or _SECTION_HEADER.match(cleaned):
            continue
        node_id, name = parse_node_line(cleaned)
        node = PlanNode(node_id, name, _indent_of(line), details.get(node_id, {}))

        while stack and stack[-1].height >= node.height:
            stack.pop()
        if stack:
            stack[-1].children.append(node)
        elif root is not None:
            raise ValueError(
                f"Execution graph contains multiple roots: {root.name} "
                f"and {node.name}"
            )
        else:
            root = node
        stack.append(node)
    return root
