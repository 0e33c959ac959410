"""Independent sequential oracle: expected canonical graph from the fact log.

Re-derives the expected (subj, pred, obj) triples and node clusters from
``generate_pages``'s page_meta with a **sequential union-find** — no Ray, no
shared code with the distributed pipeline — so e2e tests can assert that the
distributed label-propagation canonicalization and the edge-merge shuffles
produce exactly the graph the reference's semantics demand (north rule:
P/R ≥ 0.95; with the deterministic extractor the match must be exact).

Matching semantics mirrored here (the reference's systematic rules,
entity_config.yaml:493-615, at their global fixpoint):

* every mention matches on its normalized surface name (exact-name rule) —
  note this merges distinct people who share a surface form, e.g. two people
  both abbreviated "L. Khan"; that is reference behavior, not an artifact;
* Person mentions additionally match on email (the emails-array search rule);
* Organization on domain, Repository on url, Issue on id.

Canonical cluster name = surface form of the first mention in global
(page ord, within-page position) order — the "first item wins" rule.
"""

from __future__ import annotations

import re
from typing import Any


class _UnionFind:
    def __init__(self) -> None:
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent[p]
            x = p
            p = self.parent[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # keep the smaller index as root → root == first-seen mention
            if ra > rb:
                ra, rb = rb, ra
            self.parent[rb] = ra


def _norm(s: str) -> str:
    return s.lower().strip()


def _fact_mentions(f: dict[str, Any]) -> list[tuple[str, str, dict[str, str]]]:
    """→ [(entity_type, surface, extra_keys), ...] in sentence order."""
    k = f["kind"]
    if k == "works":
        return [
            ("Person", f["surface"], {"emails": f["_email"]}),
            ("Organization", f["_org_name"], {}),
        ]
    if k == "org":
        return [("Organization", f["_org_name"], {"domain": f["_domain"]})]
    if k == "repo":
        return [
            ("Repository", f["_repo_name"],
             {"url": f"https://github.com/{f['_repo_name']}"}),
            ("Organization", f["_org_name"], {}),
        ]
    if k == "issue":
        return [
            ("Person", f["surface"], {"emails": f["_email"]}),
            ("Issue", f"Issue {f['issue_id']}", {"id": f["issue_id"]}),
            ("Repository", f["_repo_name"],
             {"url": f"https://github.com/{f['_repo_name']}"}),
        ]
    if k == "pr":
        return [
            ("CodeChangeRequest", f"Pull Request #{f['pr']}", {}),
            ("Repository", f["_repo_name"],
             {"url": f"https://github.com/{f['_repo_name']}"}),
            ("Person", f["surface"], {"emails": f["_email"]}),
        ]
    if k == "review":
        return [
            ("Person", f["surface"], {"emails": f["_email"]}),
            ("CodeChangeRequest", f"Pull Request #{f['pr']}", {}),
        ]
    if k == "team":
        return [
            ("Team", f["_team_name"], {}),
            ("Organization", f["_org_name"], {}),
            ("Project", f["_project"], {}),
        ]
    raise ValueError(k)


def _fact_rels(f: dict[str, Any]) -> list[tuple[tuple[str, str], str, tuple[str, str], float]]:
    """→ [((src_type, src_surface), rel_type, (dst_type, dst_surface), strength)]."""
    k = f["kind"]
    if k == "works":
        return [(("Person", f["surface"]), "WORKS_AT",
                 ("Organization", f["_org_name"]), 8)]
    if k == "org":
        return []
    if k == "repo":
        return [(("Repository", f["_repo_name"]), "MAINTAINED_BY",
                 ("Organization", f["_org_name"]), 7)]
    if k == "issue":
        iname = f"Issue {f['issue_id']}"
        return [
            (("Person", f["surface"]), "FILED", ("Issue", iname), 6),
            (("Issue", iname), "BELONGS_TO", ("Repository", f["_repo_name"]), 7),
        ]
    if k == "pr":
        pname = f"Pull Request #{f['pr']}"
        return [
            (("Person", f["surface"]), "AUTHORED", ("CodeChangeRequest", pname), 7),
            (("CodeChangeRequest", pname), "BELONGS_TO",
             ("Repository", f["_repo_name"]), 7),
        ]
    if k == "review":
        return [(("Person", f["surface"]), "REVIEWED",
                 ("CodeChangeRequest", f"Pull Request #{f['pr']}"), 6)]
    if k == "team":
        return [
            (("Team", f["_team_name"]), "PART_OF",
             ("Organization", f["_org_name"]), 6),
            (("Project", f["_project"]), "OWNED_BY", ("Team", f["_team_name"]), 6),
        ]
    raise ValueError(k)


def _annotate(meta: list[dict[str, Any]]) -> None:
    """Recover surface strings from the rendered sentences (the fact log
    stores pool indices; parsing the sentence keeps the oracle honest about
    what actually appears on the page)."""
    for page in meta:
        for f in page["facts"]:
            s = f["sentence"]
            k = f["kind"]
            if k in ("works", "issue", "review", "pr"):
                f["_email"] = re.search(r"<([^>]+)>", s).group(1)
            if k == "works":
                f["_org_name"] = re.search(r" works at (.+)\.$", s).group(1)
            elif k == "org":
                m = re.match(r"^(.+?) \(domain: ([a-z0-9.-]+)\)", s)
                f["_org_name"], f["_domain"] = m.group(1), m.group(2)
            elif k == "repo":
                m = re.match(r"^Repository (\S+) is maintained by (.+)\.$", s)
                f["_repo_name"], f["_org_name"] = m.group(1), m.group(2)
            elif k == "issue":
                f["_repo_name"] = re.search(r" in (\S+)\.$", s).group(1)
            elif k == "pr":
                f["_repo_name"] = re.search(r" in (\S+) was opened", s).group(1)
            elif k == "team":
                m = re.match(r"^The (.+?) team at (.+?) ships (.+)\.$", s)
                f["_team_name"], f["_org_name"], f["_project"] = m.groups()


def expected_graph(meta: list[dict[str, Any]]) -> dict[str, Any]:
    """→ {"triples": {(src,type,dst): {...}}, "clusters": [...]}."""
    _annotate(meta)
    pages = sorted(meta, key=lambda p: p["ord"])

    # Pass 1: enumerate mentions in global order (dedup per page by
    # (type, surface), as the extractor does), build union-find over match keys.
    mentions: list[tuple[str, str]] = []  # idx -> (etype, surface)
    uf = _UnionFind()
    key_first: dict[tuple[str, str, str], int] = {}
    page_mention_idx: list[dict[tuple[str, str], int]] = []

    for page in pages:
        seen: dict[tuple[str, str], int] = {}
        for f in page["facts"]:
            for etype, surf, extra in _fact_mentions(f):
                if (etype, surf) in seen:
                    continue
                idx = len(mentions)
                mentions.append((etype, surf))
                seen[(etype, surf)] = idx
                keys = [(etype, "name", _norm(surf))]
                for ns, v in extra.items():
                    keys.append((etype, ns, _norm(v)))
                for key in keys:
                    if key in key_first:
                        uf.union(key_first[key], idx)
                    else:
                        key_first[key] = idx
        page_mention_idx.append(seen)

    canonical: dict[int, str] = {}  # root -> canonical surface
    for idx, (etype, surf) in enumerate(mentions):
        root = uf.find(idx)
        if root not in canonical:
            canonical[root] = surf  # min-index mention reaches here first? no —
    # roots keep the smallest index by construction, but iterate defensively:
    canonical = {}
    for idx in range(len(mentions)):
        root = uf.find(idx)
        if root not in canonical:
            canonical[root] = mentions[idx][1]

    # Pass 2: triples with canonical endpoints resolved through the page-local
    # mention map (the reference's per-document entity_mapping).
    triples: dict[tuple[str, str, str], dict[str, Any]] = {}
    for page, seen in zip(pages, page_mention_idx):
        for f in page["facts"]:
            for (st, ss), rtype, (dt, dsurf), strength in _fact_rels(f):
                src = canonical[uf.find(seen[(st, ss)])]
                dst = canonical[uf.find(seen[(dt, dsurf)])]
                key = (src, rtype, dst)
                t = triples.setdefault(
                    key,
                    {"strength": 0.0, "sources": [], "src_type": st, "dst_type": dt},
                )
                t["strength"] = max(t["strength"], float(strength))
                if page["url"] not in t["sources"]:
                    t["sources"].append(page["url"])

    clusters: dict[int, dict[str, Any]] = {}
    for idx, (etype, surf) in enumerate(mentions):
        root = uf.find(idx)
        c = clusters.setdefault(
            root, {"type": etype, "canonical": canonical[root], "surfaces": []}
        )
        if surf not in c["surfaces"]:
            c["surfaces"].append(surf)

    return {"triples": triples, "clusters": list(clusters.values())}


def precision_recall(
    produced: set[tuple[str, str, str]], expected: set[tuple[str, str, str]]
) -> tuple[float, float]:
    if not produced or not expected:
        return (0.0, 0.0)
    tp = len(produced & expected)
    return tp / len(produced), tp / len(expected)
