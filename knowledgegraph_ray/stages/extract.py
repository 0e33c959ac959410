"""Triple-extraction stage: actor pool over text batches.

Mirrors the reference's extraction contract
(/root/reference/src/workspace_kg/components/entity_extractor.py):

* empty content short-circuits to an error record (:57-67)
* the backend produces raw text in the tuple grammar (the LLM call, :28-41)
* parse_tuple_output splits it into entities/relationships (:135-270)
* the per-doc result carries counts + raw output (:107-117)

The default backend is **deterministic and rule-based** (compiled regexes over
the extracted page text) so the whole pipeline is hermetic and reproducible;
an LLM/transformer backend plugs into the same class by overriding
``_generate`` — state lives in ``__init__`` (once per actor), work in
``__call__`` (per Arrow batch), the Ray Data actor-pool pattern:

    ds.map_batches(TripleExtractor, batch_format="pyarrow",
                   batch_size=..., concurrency=N)

Output schema (one row per input doc, nested lists parquet-serializable):
    url, ord, lang, permissions:list<str>, error:str,
    entities:list<struct{entity_name, entity_type, attributes_json}>,
    relationships:list<struct{source_entity, target_entity, relationship_type,
                              description, strength, sources:list<str>}>,
    entity_count, relationship_count
"""

from __future__ import annotations

import json
import re
from typing import Any

import pyarrow as pa

from ..functions.tuple_format import (
    COMPLETE_MARK,
    parse_tuple_output,
    serialize_entity,
    serialize_relationship,
)

# Arrow types for the nested extraction-result columns.
ENTITY_T = pa.struct(
    [
        ("entity_name", pa.string()),
        ("entity_type", pa.string()),
        ("attributes_json", pa.string()),
        # Source-tracking (M11) lifted out of attributes_json: the parser
        # injects the page url into every entity's sources
        # (tuple_format.py:75-81), which would make every attributes_json
        # unique and defeat downstream parse-once dictionary encoding.  ""
        # means exactly [url]; anything else is the JSON of the full list.
        ("sources_json", pa.string()),
    ]
)
REL_T = pa.struct(
    [
        ("source_entity", pa.string()),
        ("target_entity", pa.string()),
        ("relationship_type", pa.string()),
        ("description", pa.string()),
        ("strength", pa.float32()),
        ("sources", pa.list_(pa.string())),
    ]
)

# ---------------------------------------------------------------------------
# M4: data-type detection (prompt_factory.py:48-74).  The reference's enum has
# exactly EMAIL and DOCUMENT (prompt_factory.py:7-9) — the code/meeting/chat
# branches construct enum members that do not exist and are dead; the
# REACHABLE semantics are: explicit data_type field wins (when valid), any
# email-ish field present → email, otherwise the email default.
# ---------------------------------------------------------------------------

DATA_TYPES = ("email", "document")
_EMAIL_FIELDS = ("from", "to", "subject", "sender", "recipient")


def add_data_type(batch: pa.Table, out_col: str = "data_type") -> pa.Table:
    """Vectorized per-row data-type detection → a dictionary-encoded column.

    A record "has a field" when the column exists and the value is non-null
    (the Arrow shape of the reference's dict-key checks)."""
    import pyarrow.compute as pc

    n = batch.num_rows
    names = set(batch.column_names)
    result = pa.array(["email"] * n, pa.string())  # default (prompt_factory.py:74)
    # email-specific fields present → email (already the default; kept for
    # parity with the priority chain should more types become reachable)
    present = None
    for f in _EMAIL_FIELDS:
        if f in names:
            m = pc.is_valid(batch.column(f))
            present = m if present is None else pc.or_(present, m)
    # explicit data_type field wins when it names a valid type
    if "data_type" in names:
        explicit = pc.utf8_lower(pc.cast(batch.column("data_type"), pa.string()))
        valid = pc.is_in(explicit, value_set=pa.array(DATA_TYPES))
        result = pc.if_else(pc.and_kleene(pc.is_valid(explicit), valid), explicit, result)
        batch = batch.drop_columns(["data_type"])
    return batch.append_column(out_col, pc.dictionary_encode(result))


EXTRACTION_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("ord", pa.int64()),
        ("lang", pa.string()),
        ("shard", pa.string()),
        ("permissions", pa.list_(pa.string())),
        ("error", pa.string()),
        ("entities", pa.list_(ENTITY_T)),
        ("relationships", pa.list_(REL_T)),
        ("entity_count", pa.int32()),
        ("relationship_count", pa.int32()),
    ]
)

_PERSON = r"[A-Z][A-Za-z]*\.? [A-Z][A-Za-z]+"
_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+"
_ORG = r"[A-Z][A-Za-z0-9&]*(?: [A-Z][A-Za-z0-9&]*)*"
_REPO = r"[a-z0-9-]+/[a-z0-9._-]+"


class RuleBasedBackend:
    """Deterministic stand-in for the LLM: scans text with compiled patterns
    and emits raw output in the same tuple grammar the reference's prompts
    demand (prompt_factory.py:96-110), ending with <|COMPLETE|>."""

    def __init__(self) -> None:
        self.works = re.compile(
            rf"(?P<name>{_PERSON}) <(?P<email>{_EMAIL})> works at (?P<org>{_ORG})\."
        )
        self.orgfact = re.compile(
            rf"(?P<org>{_ORG}) \(domain: (?P<domain>[a-z0-9.-]+)\) is an? "
            r"(?P<industry>[a-z]+) company based in (?P<city>[A-Z][a-z]+)\."
        )
        self.repofact = re.compile(
            rf"Repository (?P<repo>{_REPO}) is maintained by (?P<org>{_ORG})\."
        )
        self.issue = re.compile(
            rf"(?P<name>{_PERSON}) <(?P<email>{_EMAIL})> filed Issue "
            rf"(?P<iid>[A-Z]{{2,5}}-\d+) in (?P<repo>{_REPO})\."
        )
        self.pr = re.compile(
            rf"Pull Request #(?P<num>\d+) in (?P<repo>{_REPO}) was opened by "
            rf"(?P<name>{_PERSON}) <(?P<email>{_EMAIL})>\."
        )
        self.review = re.compile(
            rf"(?P<name>{_PERSON}) <(?P<email>{_EMAIL})> reviewed Pull Request "
            r"#(?P<num>\d+)\."
        )
        self.team = re.compile(
            rf"The (?P<team>[A-Z][A-Za-z]*(?: [A-Z][A-Za-z]*)*) team at "
            rf"(?P<org>{_ORG}) ships (?P<proj>Project [A-Z][a-z]+)\."
        )

    def __call__(self, text: str) -> str:
        # (position, record) pairs; entities keyed by (type, name), first-wins
        # scalar attrs, union list attrs — one entity record per surface form,
        # like an LLM would emit.
        entities: dict[tuple[str, str], dict[str, Any]] = {}
        entity_pos: dict[tuple[str, str], int] = {}
        rels: list[tuple[int, str]] = []

        def ent(pos: int, ename: str, etype: str, **attrs: Any) -> None:
            key = (etype, ename)
            if key not in entities:
                entities[key] = dict(attrs)
                entity_pos[key] = pos
            else:
                # keep the earliest text position so mention order == true
                # first-appearance order regardless of pattern scan order
                entity_pos[key] = min(entity_pos[key], pos)
                cur = entities[key]
                for k, v in attrs.items():
                    if isinstance(v, list):
                        merged = list(cur.get(k, []))
                        merged += [x for x in v if x not in merged]
                        cur[k] = merged
                    elif not cur.get(k):
                        cur[k] = v

        def rel(pos: int, src: str, dst: str, rtype: str, desc: str, strength: int) -> None:
            rels.append((pos, serialize_relationship(src, dst, rtype, desc, strength)))

        for m in self.works.finditer(text):
            name, email, org = m.group("name"), m.group("email"), m.group("org")
            ent(m.start(), name, "Person", name=name, email=email, worksAt=org,
                description=f"Works at {org}")
            ent(m.start("org"), org, "Organization", name=org)
            rel(m.start(), name, org, "WORKS_AT",
                f"{name} is an employee of {org}", 8)

        for m in self.orgfact.finditer(text):
            org = m.group("org")
            ent(m.start(), org, "Organization", name=org, domain=m.group("domain"),
                industry=m.group("industry"), location=[m.group("city")],
                description=f"{m.group('industry')} company based in {m.group('city')}")

        for m in self.repofact.finditer(text):
            repo, org = m.group("repo"), m.group("org")
            ent(m.start(), repo, "Repository", name=repo,
                url=f"https://github.com/{repo}")
            ent(m.start("org"), org, "Organization", name=org)
            rel(m.start(), repo, org, "MAINTAINED_BY",
                f"{repo} is maintained by {org}", 7)

        for m in self.issue.finditer(text):
            name, email = m.group("name"), m.group("email")
            iid, repo = m.group("iid"), m.group("repo")
            issue_name = f"Issue {iid}"
            ent(m.start(), name, "Person", name=name, email=email)
            ent(m.start("iid"), issue_name, "Issue", name=issue_name, id=iid)
            ent(m.start("repo"), repo, "Repository", name=repo,
                url=f"https://github.com/{repo}")
            rel(m.start(), name, issue_name, "FILED",
                f"{name} filed {issue_name}", 6)
            rel(m.start("iid"), issue_name, repo, "BELONGS_TO",
                f"{issue_name} belongs to {repo}", 7)

        for m in self.pr.finditer(text):
            num, repo = m.group("num"), m.group("repo")
            name, email = m.group("name"), m.group("email")
            pr_name = f"Pull Request #{num}"
            ent(m.start(), pr_name, "CodeChangeRequest", name=pr_name, repo=repo,
                author=name)
            ent(m.start("repo"), repo, "Repository", name=repo,
                url=f"https://github.com/{repo}")
            ent(m.start("name"), name, "Person", name=name, email=email)
            rel(m.start(), name, pr_name, "AUTHORED",
                f"{name} opened {pr_name}", 7)
            rel(m.start("repo"), pr_name, repo, "BELONGS_TO",
                f"{pr_name} belongs to {repo}", 7)

        for m in self.review.finditer(text):
            name, email, num = m.group("name"), m.group("email"), m.group("num")
            pr_name = f"Pull Request #{num}"
            ent(m.start(), name, "Person", name=name, email=email)
            ent(m.start("num"), pr_name, "CodeChangeRequest", name=pr_name)
            rel(m.start(), name, pr_name, "REVIEWED",
                f"{name} reviewed {pr_name}", 6)

        for m in self.team.finditer(text):
            team, org, proj = m.group("team"), m.group("org"), m.group("proj")
            ent(m.start(), team, "Team", name=team)
            ent(m.start("org"), org, "Organization", name=org)
            ent(m.start("proj"), proj, "Project", name=proj)
            rel(m.start(), team, org, "PART_OF",
                f"The {team} team is part of {org}", 6)
            rel(m.start("proj"), proj, team, "OWNED_BY",
                f"{proj} is shipped by the {team} team", 6)

        records: list[tuple[int, str]] = [
            (entity_pos[key], serialize_entity(key[1], key[0], attrs))
            for key, attrs in entities.items()
        ]
        records += rels
        records.sort(key=lambda t: t[0])
        return "\n".join(r for _, r in records) + "\n" + COMPLETE_MARK


class TripleExtractor:
    """Ray Data actor-pool stage: text batches → extraction-result batches."""

    MENTIONS_PER_DOC_CAP = 4096  # mid = ord * CAP + index must stay injective

    def __init__(self, backend: Any = None) -> None:
        self.backend = backend or RuleBasedBackend()

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        ords = batch.column("ord").to_pylist()
        langs = (
            batch.column("lang").to_pylist()
            if "lang" in batch.column_names
            else [""] * len(urls)
        )
        perms = (
            batch.column("permissions").to_pylist()
            if "permissions" in batch.column_names
            else [[] for _ in urls]
        )
        shards = (
            batch.column("shard").to_pylist()
            if "shard" in batch.column_names
            else [""] * len(urls)
        )

        out: dict[str, list[Any]] = {k: [] for k in EXTRACTION_SCHEMA.names}
        for url, text, ordinal, lang, perm, shard in zip(
            urls, texts, ords, langs, perms, shards
        ):
            error = ""
            if not text or not text.strip():
                # Empty-content short circuit (entity_extractor.py:57-67).
                error, ents, rels = "Empty content", [], []
            else:
                try:
                    raw = self.backend(text)
                    ents, rels = parse_tuple_output(raw, item_id=url)
                except Exception as exc:  # failed-doc record, not a dead task
                    # (entity_extractor.py:39-41: LLM retries=0; the failure
                    # is recorded and re-driven later via run_retry_failed)
                    error, ents, rels = f"extraction failed: {exc}", [], []
                if len(ents) > self.MENTIONS_PER_DOC_CAP:
                    ents = ents[: self.MENTIONS_PER_DOC_CAP]

            out["url"].append(url)
            out["ord"].append(ordinal)
            out["lang"].append(lang)
            out["shard"].append(shard or "")
            out["permissions"].append(perm or [])
            out["error"].append(error)
            ent_rows = []
            for e in ents:
                attrs = dict(e["attributes"])
                srcs = attrs.pop("sources", None) or []
                ent_rows.append(
                    {
                        "entity_name": e["entity_name"],
                        "entity_type": e["entity_type"],
                        "attributes_json": json.dumps(attrs, sort_keys=True),
                        # "" encodes the overwhelmingly common exact-[url]
                        # case without a JSON string per mention
                        "sources_json": "" if srcs == [url] else json.dumps(srcs),
                    }
                )
            out["entities"].append(ent_rows)
            out["relationships"].append(
                [
                    {
                        "source_entity": r["source_entity"],
                        "target_entity": r["target_entity"],
                        "relationship_type": r["relationship_type"],
                        "description": r["description"],
                        "strength": r["strength"],
                        "sources": r["sources"],
                    }
                    for r in rels
                ]
            )
            out["entity_count"].append(len(ents))
            out["relationship_count"].append(len(rels))

        return pa.Table.from_pydict(out, schema=EXTRACTION_SCHEMA)


# Module-level lazy singleton for the STATELESS-TASK extraction path: one
# extractor per worker process (compiled regexes reused across every task the
# process runs), reached via module import inside the worker fn — the same
# rule broadcast lookup state follows (cloudpickled globals copy per task).
class HeavyComputeBackend:
    """The default backend plus a deterministic CPU spin per document.

    Simulates realistic per-document model latency (a real LLM/embedding
    backend costs 10 ms – 10 s per doc; the rule-based extractor costs
    ~50 µs) WITHOUT changing any output: the spin is chained blake2b over a
    64-byte state, discarded.  Used by `bench.py --scaling-heavy` to measure
    end-to-end scaling in the compute-weighted regime the 100-TB deployment
    actually runs in.  ~0.6 µs per round on this host (calibrated)."""

    def __init__(self, work_us: int, inner: Any = None) -> None:
        self._rounds = max(0, int(work_us * 5 / 3))
        self._inner = inner or RuleBasedBackend()

    def __call__(self, text: str) -> str:
        import hashlib

        h = text[:64].encode("utf-8", "ignore") or b"\0"
        for _ in range(self._rounds):
            h = hashlib.blake2b(h, digest_size=32).digest()
        return self._inner(text)


_TASK_EXTRACTOR: TripleExtractor | None = None


def extract_batch(batch: pa.Table) -> pa.Table:
    """Task-pool extraction with the default backend.

    Why a task, not an actor pool: an actor pool statically reserves its
    `concurrency` CPUs, and the ReadParquet/prepare/write task operators get
    only the leftovers — at high CPU counts the pool starves on input (the
    measured compute-stage 8→32 scaling collapse).  As a plain function the
    whole read→prepare→extract chain fuses into ONE task operator that uses
    every CPU with natural backpressure.  Custom/heavy backends (a real LLM)
    still use the TripleExtractor actor-pool form."""
    global _TASK_EXTRACTOR
    if _TASK_EXTRACTOR is None:
        import os

        work_us = int(os.environ.get("KGRAY_EXTRACT_WORK_US", "0") or 0)
        backend = HeavyComputeBackend(work_us) if work_us > 0 else None
        _TASK_EXTRACTOR = TripleExtractor(backend)
    return _TASK_EXTRACTOR(batch)


# List-valued payloads are JSON-encoded strings in the mention/triple row
# schemas: Arrow's hash join (used for component attach and edge resolution)
# rejects list<...> non-key columns, and a string column shuffles cheaper.
MENTION_SCHEMA = pa.schema(
    [
        ("mid", pa.int64()),
        ("url", pa.string()),
        ("ord", pa.int64()),
        ("entity_name", pa.string()),
        ("entity_type", pa.string()),
        ("attributes_json", pa.string()),
        ("sources_json", pa.string()),  # "" == [url] (see ENTITY_T)
        ("permissions_json", pa.string()),
    ]
)

TRIPLE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("ord", pa.int64()),
        ("source_entity", pa.string()),
        ("target_entity", pa.string()),
        ("relationship_type", pa.string()),
        ("description", pa.string()),
        ("strength", pa.float32()),
        ("sources_json", pa.string()),
        ("permissions_json", pa.string()),
    ]
)


def explode_mentions(batch: pa.Table) -> pa.Table:
    """Extraction results → one row per entity mention.

    mid = ord * CAP + index_within_doc: a dense, totally ordered mention id
    that pins the reference's "first item wins" batch-arrival order
    (systematic_merge_provider.py:713-726) to a deterministic global order.
    Page permissions are injected into every mention (M10,
    vespa_email_pipeline.py:624-666).
    """
    cap = TripleExtractor.MENTIONS_PER_DOC_CAP
    out: dict[str, list[Any]] = {k: [] for k in MENTION_SCHEMA.names}
    urls = batch.column("url").to_pylist()
    ords = batch.column("ord").to_pylist()
    perms = batch.column("permissions").to_pylist()
    ents_col = batch.column("entities").to_pylist()
    for url, ordinal, perm, ents in zip(urls, ords, perms, ents_col):
        for i, e in enumerate(ents or []):
            out["mid"].append(ordinal * cap + i)
            out["url"].append(url)
            out["ord"].append(ordinal)
            out["entity_name"].append(e["entity_name"])
            out["entity_type"].append(e["entity_type"])
            out["attributes_json"].append(e["attributes_json"])
            out["sources_json"].append(e.get("sources_json") or "")
            out["permissions_json"].append(json.dumps(perm or []))
    return pa.Table.from_pydict(out, schema=MENTION_SCHEMA)


def explode_triples(batch: pa.Table) -> pa.Table:
    """Extraction results → one row per raw (subj, pred, obj) triple, with
    page permissions injected (M10)."""
    out: dict[str, list[Any]] = {k: [] for k in TRIPLE_SCHEMA.names}
    urls = batch.column("url").to_pylist()
    ords = batch.column("ord").to_pylist()
    perms = batch.column("permissions").to_pylist()
    rels_col = batch.column("relationships").to_pylist()
    for url, ordinal, perm, rels in zip(urls, ords, perms, rels_col):
        for r in rels or []:
            out["url"].append(url)
            out["ord"].append(ordinal)
            out["source_entity"].append(r["source_entity"])
            out["target_entity"].append(r["target_entity"])
            out["relationship_type"].append(r["relationship_type"])
            out["description"].append(r["description"])
            out["strength"].append(r["strength"])
            # "" encodes exactly [url] — the parser's unconditional
            # sources=[item_id] (tuple_format.py:109), i.e. every triple
            out["sources_json"].append(
                "" if (r["sources"] or []) == [url] else json.dumps(r["sources"] or [])
            )
            out["permissions_json"].append(json.dumps(perm or []))
    return pa.Table.from_pydict(out, schema=TRIPLE_SCHEMA)
