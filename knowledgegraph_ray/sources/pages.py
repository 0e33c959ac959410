"""Deterministic synthetic Common-Crawl-style page generator.

Produces the north-rule input table ``(url, warc_ts, html:binary, text, lang)``
plus ``ord`` (global ordinal pinning "first item wins" semantics) and
``permissions`` (list<string>, the reference's metadata.permissions carried as
a column — vespa_email_pipeline.py:624-666 injects it into every extracted
entity/relationship).

Pages embed entity mentions and relationship sentences from a seeded world
model (people with emails, orgs with domains, repos ``owner/name``, issues
``AB-123``, ``Pull Request #N``, teams, projects) with a **zipfian popularity
distribution** — a few hub entities appear in a large fraction of pages, which
exercises the head-entity-skew path of the canonicalization shuffle.

``text`` is exactly ``extract_text(html)`` so tests can assert the byte-
identical per-url invariant, and the generator returns a per-page fact log
from which an independent oracle (sources/golden.py) derives the expected
canonical graph for P/R checks.

Everything is a pure function of (n_pages, seed): no wall clock, no network.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from typing import Any

import numpy as np
import pyarrow as pa

from ..functions.text_extract import extract_text

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
        ("ord", pa.int64()),
        ("permissions", pa.list_(pa.string())),
    ]
)

_FIRST = [
    "Sarah", "James", "Maria", "Wei", "Priya", "Tom", "Elena", "Ahmed", "Lucia",
    "Ivan", "Grace", "Noah", "Aisha", "Diego", "Hana", "Oliver", "Fatima",
    "Lukas", "Nina", "Ravi",
]
_LAST = [
    "Jones", "Smith", "Garcia", "Chen", "Patel", "Novak", "Okafor", "Kim",
    "Brown", "Silva", "Tanaka", "Weber", "Rossi", "Khan", "Lee", "Mori",
    "Dubois", "Ivanov", "Costa", "Haddad",
]
_ORG_STEM = [
    "Acme", "Globex", "Initech", "Umbra", "Hooli", "Vandelay", "Stark",
    "Wayne", "Cyberdyne", "Tyrell", "Aperture", "Wonka", "Oscorp", "Zorg",
]
_ORG_SUFFIX = ["Corp", "Inc", "Labs", "Systems", "GmbH"]
_INDUSTRY = ["software", "fintech", "logistics", "robotics", "media"]
_CITY = ["Berlin", "Austin", "Singapore", "Toronto", "Lisbon", "Nairobi"]
_REPO_WORDS = [
    "payments", "search", "gateway", "dashboard", "ingest", "mailer",
    "planner", "graph", "billing", "auth",
]
_TEAM_WORDS = ["Platform", "Growth", "Infra", "Data", "Mobile", "Search"]
_PROJECT_CODE = [
    "Aurora", "Falcon", "Mercury", "Odyssey", "Pioneer", "Quasar", "Titan",
    "Vega", "Zephyr", "Nimbus",
]
_FILLER = [
    "The quarterly report was circulated to all stakeholders for comments.",
    "Please see the attached notes from last week before the next sync.",
    "This page is part of the public engineering archive.",
    "Nothing else of note happened during the rollout window.",
    "Weather in the region stayed calm through the whole release weekend.",
]

_EPOCH = datetime(2024, 1, 1)


@dataclass(frozen=True)
class _Person:
    idx: int
    name: str
    short: str  # abbreviated surface form, e.g. "S. Jones"
    email: str
    org: int


@dataclass(frozen=True)
class _Org:
    idx: int
    name: str
    domain: str
    industry: str
    city: str


@dataclass
class World:
    """Seeded entity pool shared by the generator and the oracle."""

    persons: list[_Person] = field(default_factory=list)
    orgs: list[_Org] = field(default_factory=list)
    repos: list[str] = field(default_factory=list)  # "owner/name"
    repo_org: list[int] = field(default_factory=list)
    teams: list[str] = field(default_factory=list)
    team_org: list[int] = field(default_factory=list)
    projects: list[str] = field(default_factory=list)


def _build_world(n_pages: int, rng: np.random.Generator) -> World:
    """Rejection-sampling targets are capped at 90% of the distinct-combo
    space — a target equal to the max turns the sampler into a full coupon
    collector (and repo names collide on org-name *stems*, so their true max
    is stems × words, far below orgs × words)."""
    w = World()
    n_orgs = max(4, min(int(len(_ORG_STEM) * len(_ORG_SUFFIX) * 0.9), 4 + n_pages // 40))
    used = set()
    while len(w.orgs) < n_orgs:
        name = f"{_ORG_STEM[int(rng.integers(len(_ORG_STEM)))]} {_ORG_SUFFIX[int(rng.integers(len(_ORG_SUFFIX)))]}"
        if name in used:
            continue
        used.add(name)
        domain = name.lower().replace(" ", "-") + ".com"
        w.orgs.append(
            _Org(
                len(w.orgs),
                name,
                domain,
                _INDUSTRY[int(rng.integers(len(_INDUSTRY)))],
                _CITY[int(rng.integers(len(_CITY)))],
            )
        )

    n_persons = max(12, min(int(len(_FIRST) * len(_LAST) * 0.9), 12 + n_pages // 6))
    seen_names = set()
    while len(w.persons) < n_persons:
        fn = _FIRST[int(rng.integers(len(_FIRST)))]
        ln = _LAST[int(rng.integers(len(_LAST)))]
        name = f"{fn} {ln}"
        if name in seen_names:
            continue
        seen_names.add(name)
        org = int(rng.integers(len(w.orgs)))
        email = f"{fn.lower()}.{ln.lower()}@{w.orgs[org].domain}"
        w.persons.append(_Person(len(w.persons), name, f"{fn[0]}. {ln}", email, org))

    n_stems = len({o.name.split(" ")[0] for o in w.orgs})
    n_repos = max(6, min(int(n_stems * len(_REPO_WORDS) * 0.9), 6 + n_pages // 20))
    seen_repos = set()
    while len(w.repos) < n_repos:
        org = int(rng.integers(len(w.orgs)))
        word = _REPO_WORDS[int(rng.integers(len(_REPO_WORDS)))]
        owner = w.orgs[org].name.split(" ")[0].lower()
        repo = f"{owner}/{word}-svc"
        if repo in seen_repos:
            continue
        seen_repos.add(repo)
        w.repos.append(repo)
        w.repo_org.append(org)

    for i, word in enumerate(_TEAM_WORDS):
        w.teams.append(word)
        w.team_org.append(i % len(w.orgs))
    w.projects = [f"Project {c}" for c in _PROJECT_CODE]
    return w


def _zipf_idx(rng: np.random.Generator, n: int) -> int:
    """Power-law index in [0, n): index 0 is the hub (head-skew)."""
    u = float(rng.random())
    return min(n - 1, int(n * (u ** 2.7)))


# Fact kinds. Each fact is a dict:
#   {"kind", "sentence", plus kind-specific entity references}
# strength per kind varies by page to exercise the max-strength edge merge.


def _facts_for_page(w: World, rng: np.random.Generator, page_idx: int) -> list[dict[str, Any]]:
    facts: list[dict[str, Any]] = []
    n_facts = 2 + int(rng.integers(4))
    for _ in range(n_facts):
        kind = int(rng.integers(7))
        if kind == 0:
            p = w.persons[_zipf_idx(rng, len(w.persons))]
            org = w.orgs[p.org]
            facts.append(
                {
                    "kind": "works",
                    "person": p.idx,
                    "surface": p.name,
                    "org": org.idx,
                    "strength": 8,
                    "sentence": f"{p.name} <{p.email}> works at {org.name}.",
                }
            )
        elif kind == 1:
            org = w.orgs[_zipf_idx(rng, len(w.orgs))]
            facts.append(
                {
                    "kind": "org",
                    "org": org.idx,
                    "sentence": (
                        f"{org.name} (domain: {org.domain}) is a {org.industry} "
                        f"company based in {org.city}."
                    ),
                }
            )
        elif kind == 2:
            r = _zipf_idx(rng, len(w.repos))
            org = w.orgs[w.repo_org[r]]
            facts.append(
                {
                    "kind": "repo",
                    "repo": r,
                    "org": org.idx,
                    "strength": 7,
                    "sentence": f"Repository {w.repos[r]} is maintained by {org.name}.",
                }
            )
        elif kind == 3:
            p = w.persons[_zipf_idx(rng, len(w.persons))]
            r = _zipf_idx(rng, len(w.repos))
            iid = f"{w.repos[r].split('/')[0][:2].upper()}-{100 + (p.idx * 37 + r * 11) % 900}"
            facts.append(
                {
                    "kind": "issue",
                    "person": p.idx,
                    "surface": p.name,
                    "repo": r,
                    "issue_id": iid,
                    "strength": 6,
                    "sentence": f"{p.name} <{p.email}> filed Issue {iid} in {w.repos[r]}.",
                }
            )
        elif kind == 4:
            p = w.persons[_zipf_idx(rng, len(w.persons))]
            r = _zipf_idx(rng, len(w.repos))
            prn = 100 + (p.idx * 53 + r * 17) % 9000
            facts.append(
                {
                    "kind": "pr",
                    "person": p.idx,
                    "surface": p.name,
                    "repo": r,
                    "pr": prn,
                    "strength": 7,
                    "sentence": (
                        f"Pull Request #{prn} in {w.repos[r]} was opened by "
                        f"{p.name} <{p.email}>."
                    ),
                }
            )
        elif kind == 5:
            # Abbreviated surface form + shared email → exercises the
            # email-search merge rule and first-seen canonical naming.
            p = w.persons[_zipf_idx(rng, len(w.persons))]
            r = _zipf_idx(rng, len(w.repos))
            prn = 100 + (p.idx * 53 + r * 17) % 9000
            facts.append(
                {
                    "kind": "review",
                    "person": p.idx,
                    "surface": p.short,
                    "repo": r,
                    "pr": prn,
                    "strength": 6,
                    "sentence": f"{p.short} <{p.email}> reviewed Pull Request #{prn}.",
                }
            )
        else:
            t = int(rng.integers(len(w.teams)))
            org = w.orgs[w.team_org[t]]
            proj = w.projects[(t * 3 + page_idx) % len(w.projects)]
            facts.append(
                {
                    "kind": "team",
                    "team": t,
                    "org": org.idx,
                    "project": proj,
                    "strength": 6,
                    "sentence": f"The {w.teams[t]} team at {org.name} ships {proj}.",
                }
            )
    return facts


_HTML_HEAD = (
    "<!DOCTYPE html><html><head><title>{title}</title>"
    "<style>body {{ font: 14px sans-serif; }}</style>"
    "<script>var _t = {page_idx}; trackPage(_t);</script>"
    "</head><body><nav><ul><li>Home</li><li>Archive &amp; Docs</li></ul></nav>"
    "<!-- crawler snapshot {page_idx} -->"
)
_HTML_TAIL = "<footer>Contact &copy; example.org</footer></body></html>"


def _render_html(page_idx: int, facts: list[dict[str, Any]], rng: np.random.Generator) -> str:
    import html as _h

    title = f"Workspace digest {page_idx}"
    parts = [_HTML_HEAD.format(title=title, page_idx=page_idx)]
    parts.append(f"<h1>{title}</h1>")
    for f in facts:
        # html-escape so "<email>" survives tag stripping as &lt;email&gt;
        parts.append(f"<p>{_h.escape(f['sentence'])}</p>")
        if rng.random() < 0.4:
            parts.append(f"<p>{_FILLER[int(rng.integers(len(_FILLER)))]}</p>")
    parts.append(_HTML_TAIL)
    return "".join(parts)


_WORLD_CACHE: dict[tuple[int, int], World] = {}


def _world_for(n_pages: int, seed: int) -> World:
    """World sizes depend on the TOTAL page count, so the world is built once
    per (n_pages, seed) and shared by every shard/range."""
    key = (n_pages, seed)
    if key not in _WORLD_CACHE:
        _WORLD_CACHE[key] = _build_world(n_pages, np.random.default_rng(seed))
    return _WORLD_CACHE[key]


def generate_pages(
    n_pages: int,
    seed: int = 42,
    empty_rate: float = 0.02,
    nonen_rate: float = 0.03,
    start: int = 0,
    limit: int | None = None,
) -> tuple[pa.Table, list[dict[str, Any]]]:
    """Build (pages_table, page_meta) for pages [start, start+limit).

    Each page draws from its own seeded stream (``default_rng([seed, i])``),
    so any sub-range is byte-identical to the same rows of the full table —
    shards can be generated independently and in parallel.

    page_meta[i] = {"url", "ord", "facts": [...]} — the fact log the oracle in
    sources/golden.py consumes.  Pages with blank content (empty_rate) and
    non-English pages (nonen_rate, no extractable facts) are included to
    exercise the empty-content filter (entity_extractor.py:57-67) and language
    handling.
    """
    world = _world_for(n_pages, seed)
    end = n_pages if limit is None else min(n_pages, start + limit)

    urls, tss, htmls, texts, langs, ords, perms = [], [], [], [], [], [], []
    meta: list[dict[str, Any]] = []

    for i in range(start, end):
        rng = np.random.default_rng([seed, i])
        url = f"https://crawl.example.org/{seed}/{i:08d}"
        roll = float(rng.random())
        if roll < empty_rate:
            facts: list[dict[str, Any]] = []
            html = "<html><body><script>void(0)</script></body></html>"
            lang = "en"
        elif roll < empty_rate + nonen_rate:
            facts = []
            html = (
                "<html><body><p>Dies ist eine Archivseite ohne verwertbare "
                f"Angaben. Nummer {i}.</p></body></html>"
            )
            lang = "de"
        else:
            facts = _facts_for_page(world, rng, i)
            html = _render_html(i, facts, rng)
            lang = "en"

        owner_org = world.orgs[i % len(world.orgs)]
        page_perms = [f"viewer@{owner_org.domain}"]

        urls.append(url)
        tss.append(_EPOCH + timedelta(seconds=i))
        htmls.append(html.encode("utf-8"))
        texts.append(extract_text(html))
        langs.append(lang)
        ords.append(i)
        perms.append(page_perms)
        meta.append({"url": url, "ord": i, "facts": facts, "permissions": page_perms})

    table = pa.Table.from_pydict(
        {
            "url": urls,
            "warc_ts": tss,
            "html": htmls,
            "text": texts,
            "lang": langs,
            "ord": ords,
            "permissions": perms,
        },
        schema=PAGES_SCHEMA,
    )
    return table, meta


def write_pages(
    out_dir: str,
    n_pages: int,
    seed: int = 42,
    rows_per_file: int = 2000,
    parallel: bool = False,
) -> list[str]:
    """Write the synthetic pages as a directory of Parquet shards; returns the
    file list.  Sharding gives the pipeline natural input partitions for the
    lineage-manifest / resume story.  With ``parallel=True`` (requires an
    initialized Ray session) shards are generated by Ray tasks — identical
    bytes thanks to the per-page seed streams."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    starts = list(range(0, n_pages, rows_per_file))
    paths = [
        os.path.join(out_dir, f"pages-{s // rows_per_file:05d}.parquet") for s in starts
    ]

    if parallel:
        import ray

        @ray.remote
        def _gen_shard(start: int, path: str) -> str:
            table, _ = generate_pages(
                n_pages, seed=seed, start=start, limit=rows_per_file
            )
            pq.write_table(table, path)
            return path

        ray.get([_gen_shard.remote(s, p) for s, p in zip(starts, paths)])
    else:
        for s, p in zip(starts, paths):
            table, _ = generate_pages(n_pages, seed=seed, start=s, limit=rows_per_file)
            pq.write_table(table, p)
    return paths


def world_fingerprint(n_pages: int, seed: int = 42) -> str:
    """Stable digest of the generated table — used by tests to pin determinism."""
    table, _ = generate_pages(n_pages, seed=seed)
    h = hashlib.sha256()
    for col in ("url", "text", "lang"):
        for v in table.column(col).to_pylist():
            h.update(str(v).encode())
    return h.hexdigest()
