"""Graphviz subtree visualization (host-side; parity with the reference's
CobwebWrapper._visualize_grandparent_tree, CobwebWrapper.py:563-694).

Renders one PNG per "grandparent" node (a node with grandchildren): the
grandparent, its child clusters, and leaf sentences in wrapped text boxes,
batched ``num_leaves`` per image.  Not performance-relevant — plain host code.
"""

from __future__ import annotations

import hashlib
import os
import textwrap


def _sentence_label(sentences, sid, max_len=250, wrap=40):
    if sid is None or not (0 <= sid < len(sentences)):
        return None
    s = sentences[sid]
    if not s:
        return None
    if len(s) > max_len:
        s = s[:max_len].rstrip() + "..."
    return "\n".join(textwrap.wrap(s, wrap)) or None


def visualize_grandparent_subtrees(tree, sentences, sids_by_leaf,
                                   output_dir: str, num_leaves: int = 6):
    try:
        from graphviz import Digraph
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "graphviz is required for subtree visualization"
        ) from e

    import numpy as np

    os.makedirs(output_dir, exist_ok=True)
    st = tree._host_arrays()

    def children(n):
        return [int(st.children[n, i]) for i in range(int(st.n_children[n]))]

    def leaf_label(n):
        for sid in sids_by_leaf.get(n, []):
            lbl = _sentence_label(sentences, sid)
            if lbl:
                return lbl
        return None

    # collect grandparents with at least one labeled grandchild leaf
    grandparents = []
    stack = [int(st.root)]
    while stack:
        n = stack.pop()
        kids = children(n)
        grand = [g for c in kids for g in children(c)]
        if grand and any(leaf_label(g) for g in grand):
            grandparents.append(n)
        stack.extend(kids)

    rendered = []
    for gp in grandparents:
        parent_map = {}
        all_leaves = []
        for c in children(gp):
            valid = [g for g in children(c) if leaf_label(g)]
            if valid:
                parent_map[c] = valid
                all_leaves.extend(valid)
        if not all_leaves:
            continue
        batches = [
            all_leaves[i:i + num_leaves]
            for i in range(0, len(all_leaves), num_leaves)
        ]
        for bi, batch in enumerate(batches):
            dot = Digraph(comment="Grandparent Subtree", format="png")
            dot.attr(rankdir="TB")
            dot.attr("edge", color="lightblue")
            gp_id = f"gp{gp}"
            dot.node(gp_id, "", shape="circle", width="0.5",
                     style="filled", color="lightblue")
            for c, leaves in parent_map.items():
                sel = [l for l in leaves if l in batch]
                if not sel:
                    continue
                cid = f"p{c}"
                dot.node(cid, "", shape="circle", width="0.25",
                         style="filled", color="#666666")
                dot.edge(gp_id, cid)
                for l in sel:
                    dot.node(f"l{l}", leaf_label(l), shape="box",
                             style="filled", color="lightgrey")
                    dot.edge(cid, f"l{l}")
            tag = hashlib.sha1(str(gp).encode()).hexdigest()[:8]
            path = os.path.join(output_dir, f"gp_{gp}_{tag}_{bi}")
            try:
                dot.render(path, cleanup=True)
                rendered.append(path + ".png")
            except Exception:
                # `dot` binary missing: keep the graph source so it can be
                # rendered elsewhere
                dot.save(path + ".dot")
                rendered.append(path + ".dot")
    return rendered
