"""Visualization of torus-graph coupling results (reference Figures 3, 6).

Parity targets: ``/root/reference/auditory_lfp/viz_torus_graph.py`` and
``/root/reference/neuropixels/viz_torus_graph.py`` — p-value matrices and
Bonferroni-thresholded bipartite coupling graphs with bootstrap-CI edge
shading.  Pure matplotlib/networkx, consuming
:class:`gpcsd_tpu.models.torus_graph.TorusGraphResult`.
"""

from __future__ import annotations

import numpy as np


def pvals_to_matrix(pvals, pairs, d):
    """(npairs,) p-values -> symmetric (d, d) matrix with NaN diagonal."""
    M = np.full((d, d), np.nan)
    for p, (j, k) in zip(np.asarray(pvals), np.asarray(pairs)):
        M[j, k] = M[k, j] = p
    return M


def plot_pvalue_matrix(ax, pvals, pairs, d, title="", split=None):
    """Heatmap of -log10 p per channel pair; optional probe-boundary line."""
    M = pvals_to_matrix(pvals, pairs, d)
    with np.errstate(divide="ignore"):
        img = -np.log10(np.maximum(M, 1e-300))
    im = ax.imshow(img, cmap="viridis")
    if split is not None:
        ax.axhline(split - 0.5, color="w", lw=1)
        ax.axvline(split - 0.5, color="w", lw=1)
    ax.set_title(title)
    ax.set_xlabel("channel")
    ax.set_ylabel("channel")
    return im


def plot_coupling_graph(ax, result, d, alpha=0.001, split=None,
                        edge_weight="cond_coupling", ci_lower=None,
                        node_positions=None, title=""):
    """Bonferroni-thresholded coupling graph.

    :param result: TorusGraphResult
    :param split: if set, draw a bipartite two-probe layout split at this
        channel index (reference two-probe figures)
    :param ci_lower: optional (npairs,) bootstrap lower CI of the coupling —
        edges with ci_lower <= 0 are drawn dashed (reference CI shading)
    """
    import networkx as nx

    pvals = np.asarray(result.pvals)
    weights = np.asarray(getattr(result, edge_weight))
    pairs = np.asarray(result.pairs)
    npairs = pairs.shape[0]
    thresh = alpha / npairs

    G = nx.Graph()
    G.add_nodes_from(range(d))
    for i, (j, k) in enumerate(pairs):
        if pvals[i] < thresh:
            solid = ci_lower is None or ci_lower[i] > 0
            G.add_edge(int(j), int(k), weight=float(weights[i]), solid=solid)

    if node_positions is None:
        if split is not None:
            node_positions = {
                n: (0 if n < split else 1, -(n if n < split else n - split))
                for n in range(d)
            }
        else:
            node_positions = nx.circular_layout(G)

    nx.draw_networkx_nodes(G, node_positions, ax=ax, node_size=60, node_color="k")
    solid_edges = [e for e in G.edges if G.edges[e]["solid"]]
    dashed_edges = [e for e in G.edges if not G.edges[e]["solid"]]
    widths = [3.0 * G.edges[e]["weight"] for e in solid_edges]
    nx.draw_networkx_edges(G, node_positions, ax=ax, edgelist=solid_edges, width=widths)
    nx.draw_networkx_edges(
        G, node_positions, ax=ax, edgelist=dashed_edges, style="dashed", alpha=0.5
    )
    ax.set_title(f"{title} ({G.number_of_edges()} edges, Bonferroni {alpha})")
    ax.axis("off")
    return G


def plot_torus_graph_summary(result, d, split=None, alpha=0.001, ci_lower=None,
                             save_path=None):
    """Two-panel figure: p-value matrix + coupling graph."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(12, 5))
    plot_pvalue_matrix(axes[0], result.pvals, result.pairs, d,
                       title="-log10 p", split=split)
    plot_coupling_graph(axes[1], result, d, alpha=alpha, split=split,
                        ci_lower=ci_lower, title="coupling")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
    return fig
