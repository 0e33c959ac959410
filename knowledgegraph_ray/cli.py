"""Command-line entry points (the reference's main.py, merge_pipeline.py,
query_search.py and kuzu_init.py CLIs mapped onto the Ray engine).

    python -m knowledgegraph_ray.cli build   --input pages/ --work work/
    python -m knowledgegraph_ray.cli merge   --graph work/ --extracted new/ --out merged/
    python -m knowledgegraph_ray.cli stats   --graph work/
    python -m knowledgegraph_ray.cli details --graph work/ --name "Sarah Jones"
    python -m knowledgegraph_ray.cli relations --graph work/ --name "Acme Corp" [--direction in|out|both]
    python -m knowledgegraph_ray.cli search  --graph work/ --text "payment service" [-k 10]
    python -m knowledgegraph_ray.cli admin   --graph work/ (--status | --clean | --backup-schema out.json)
    python -m knowledgegraph_ray.cli export  --graph work/ --out export.json

Only this CLI owns the Ray session (the library never calls ray.init)."""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(num_cpus: int | None) -> None:
    """Own the Ray session.  KGRAY_RAY_ADDRESS selects the target:
    unset/"local" starts an in-process node (the test/bench default);
    "auto" or a ray:// URL attaches to an existing cluster (the
    `ray job submit` path, docs/CLUSTER.md) — num_cpus is a LOCAL-node
    sizing knob and is ignored when attaching, the cluster's resources
    are what they are."""
    import ray

    if not ray.is_initialized():
        address = os.environ.get("KGRAY_RAY_ADDRESS", "local")
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus and address == "local":
            kwargs["num_cpus"] = num_cpus
        ray.init(address=address, **kwargs)


def _graph_dirs(graph: str) -> tuple[str, str]:
    return os.path.join(graph, "nodes"), os.path.join(graph, "edges")


def _linking_cfg(args: argparse.Namespace):
    """--linking enables the fuzzy entity-linking candidate stage
    (stages/linking.py); --linking-threshold tunes the cosine gate."""
    if not getattr(args, "linking", False):
        return None
    from .stages.linking import LinkingConfig

    return LinkingConfig(threshold=args.linking_threshold)


def _backend_factory(args: argparse.Namespace):
    """--llm-backend → a TripleExtractor backend factory (None = hermetic
    rule-based default).  'openai' is the reference's production extractor
    (entity_extractor.py:12-41): OpenAI-compatible chat completion driven by
    $OPENAI_API_KEY / $OPENAI_API_BASE_URL / $LLM_MODEL_NAME."""
    choice = getattr(args, "llm_backend", "rule")
    if choice == "rule":
        return None
    if choice == "openai":
        from .stages.backends import OpenAIChatBackend

        return lambda: OpenAIChatBackend()
    raise SystemExit(f"unknown --llm-backend {choice!r}")


def _embed_backend(args: argparse.Namespace):
    """--embed-backend → an Embedder backend ('hash' default; 'transformer'
    = warm AutoModel mean pooling via $EMBEDDING_MODEL, 'ollama' = HTTP via
    $OLLAMA_BASE_URL/$OLLAMA_EMBEDDING_MODEL).  Real backends are wrapped in
    LazyBackend so the model loads ONCE PER ACTOR, never on the driver; and
    nothing is built at all unless --embed is on."""
    choice = getattr(args, "embed_backend", "hash")
    if choice == "hash" or not getattr(args, "embed", False):
        return None
    from .stages.backends import LazyBackend

    if choice == "transformer":
        from .stages.backends import TransformerBackend

        return LazyBackend(TransformerBackend)
    if choice == "ollama":
        from .stages.backends import OllamaHTTPBackend

        return LazyBackend(OllamaHTTPBackend)
    raise SystemExit(f"unknown --embed-backend {choice!r}")


def cmd_build(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    from .pipelines import kg_build

    fmt = getattr(args, "input_format", "parquet")
    exts = (".warc", ".warc.gz") if fmt == "warc" else (".parquet",)
    paths = sorted(
        os.path.join(args.input, f)
        for f in os.listdir(args.input)
        if f.endswith(exts)
    )
    res = kg_build(
        paths,
        args.work,
        batch_size=args.batch_size,
        concurrency=args.concurrency,
        num_partitions=args.num_partitions,
        resume=not args.no_resume,
        embed=args.embed,
        embed_dim=args.embed_dim,
        linking=_linking_cfg(args),
        backend_factory=_backend_factory(args),
        embed_backend=_embed_backend(args),
        input_format=fmt,
    )
    print(json.dumps(res.metrics, default=str))
    return 0


def cmd_retry(args: argparse.Namespace) -> int:
    """Re-drive failed extraction rows (RETRY_FAILED_EMAILS parity)."""
    _init_ray(args.num_cpus)
    from .pipelines.kg_build import run_retry_failed

    fmt = getattr(args, "input_format", "parquet")
    exts = (".warc", ".warc.gz") if fmt == "warc" else (".parquet",)
    paths = sorted(
        os.path.join(args.input, f)
        for f in os.listdir(args.input)
        if f.endswith(exts)
    )
    out = run_retry_failed(
        paths, args.work, batch_size=args.batch_size,
        concurrency=args.concurrency, input_format=fmt,
    )
    print(json.dumps(out))
    return 0


def cmd_merge(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    import ray.data as rd

    from .pipelines.incremental import incremental_merge

    nodes_dir, edges_dir = _graph_dirs(args.graph)
    res = incremental_merge(
        rd.read_parquet(nodes_dir),
        rd.read_parquet(edges_dir),
        rd.read_parquet(args.extracted),
        args.out,
        num_partitions=args.num_partitions,
    )
    print(json.dumps(res))
    return 0


def cmd_stats(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    from .stages.graph_query import stats

    nodes_dir, edges_dir = _graph_dirs(args.graph)
    print(json.dumps(stats(nodes_dir, edges_dir)))
    return 0


def cmd_details(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    from .stages.graph_query import details

    nodes_dir, _ = _graph_dirs(args.graph)
    rows = details(nodes_dir, args.name, args.type).take_all()
    print(json.dumps(rows, default=str))
    return 0


def cmd_relations(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    from .stages.graph_query import relations

    _, edges_dir = _graph_dirs(args.graph)
    rows = relations(edges_dir, args.name, args.direction, args.limit).take_all()
    print(json.dumps(rows, default=str))
    return 0


def cmd_search(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    import ray.data as rd

    from .stages.embedder import embed_nodes, hash_embedding
    from .stages.graph_query import search

    nodes_dir, _ = _graph_dirs(args.graph)
    nodes = rd.read_parquet(nodes_dir)
    schema = nodes.schema()
    if "embedding" not in schema.names:
        nodes = embed_nodes(nodes, dim=args.dim, concurrency=2).materialize()
    q = hash_embedding(args.text, args.dim)
    rows = search(nodes, q, k=args.k).take_all()
    print(json.dumps(rows, default=str))
    return 0


def run_repl(nodes, edges, dim: int = 64, input_fn=input, print_fn=print) -> None:
    """Interactive search loop (query_search.py:295-365 parity): free-text
    semantic search plus the special commands help / stats / simple /
    top N / details <name> <type> / relations <name> <type> / exit.

    ``input_fn``/``print_fn`` are injectable so the loop is testable."""
    from .stages.embedder import hash_embedding
    from .stages import graph_query

    max_results = 10
    show_details = True
    print_fn("Interactive Knowledge Graph Search — 'help' for commands, 'exit' to stop")
    while True:
        try:
            query = input_fn("search> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not query:
            continue
        low = query.lower()
        try:
            if low in ("exit", "quit"):
                break
            elif low == "help":
                print_fn(
                    "commands: <free text search> | stats | simple | top <n> | "
                    "details <name> <type> | relations <name> <type> | exit"
                )
            elif low == "stats":
                print_fn(json.dumps(graph_query.stats(nodes, edges)))
            elif low == "simple":
                show_details = not show_details
                print_fn(f"display: {'detailed' if show_details else 'simple'}")
            elif low.startswith("top "):
                try:
                    max_results = max(1, min(50, int(query.split()[1])))
                    print_fn(f"results limit: {max_results}")
                except (IndexError, ValueError):
                    print_fn("invalid format. use: top <number>")
            elif low.startswith("details "):
                parts = query.split()[1:]
                if len(parts) >= 2:
                    rows = graph_query.details(nodes, " ".join(parts[:-1]), parts[-1])
                    print_fn(json.dumps(rows, default=str))
                else:
                    print_fn("invalid format. use: details <entity_name> <entity_type>")
            elif low.startswith("relations "):
                parts = query.split()[1:]
                if len(parts) >= 2:
                    rows = graph_query.relations(edges, " ".join(parts[:-1]))
                    print_fn(json.dumps(rows, default=str))
                else:
                    print_fn("invalid format. use: relations <entity_name> <entity_type>")
            else:
                q = hash_embedding(query, dim)
                rows = graph_query.search(nodes, q, k=max_results).take_all()
                if not show_details:
                    rows = [{"name": r.get("name")} for r in rows]
                print_fn(json.dumps(rows, default=str))
        except Exception as exc:  # REPL survives per-command errors
            print_fn(f"error: {exc}")


def cmd_repl(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    import ray.data as rd

    from .stages.embedder import embed_nodes

    nodes_dir, edges_dir = _graph_dirs(args.graph)
    nodes = rd.read_parquet(nodes_dir)
    if "embedding" not in nodes.schema().names:
        nodes = embed_nodes(nodes, dim=args.dim, concurrency=2)
    nodes = nodes.materialize()
    edges = rd.read_parquet(edges_dir).materialize()
    run_repl(nodes, edges, dim=args.dim)
    return 0


def cmd_admin(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    from .sources.io_json import backup_schema, clean_graph, graph_status

    if args.clean:
        print(json.dumps({"removed": clean_graph(args.graph)}))
    elif args.backup_schema:
        print(json.dumps({"written": backup_schema(args.graph, args.backup_schema)}))
    else:
        print(json.dumps(graph_status(args.graph)))
    return 0


def cmd_export(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    import ray.data as rd

    from .sources.io_json import export_graph_json

    nodes_dir, edges_dir = _graph_dirs(args.graph)
    path = export_graph_json(
        rd.read_parquet(nodes_dir),
        rd.read_parquet(edges_dir),
        args.out,
        run_stamp=args.stamp,
    )
    print(json.dumps({"written": path}))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="knowledgegraph_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--work", required=True)
    b.add_argument("--batch-size", type=int, default=256)
    b.add_argument("--concurrency", type=int, default=4)
    b.add_argument("--num-partitions", type=int, default=16)
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--embed", action="store_true")
    b.add_argument("--embed-dim", type=int, default=1024)
    b.add_argument("--input-format", choices=["parquet", "warc"],
                   default="parquet",
                   help="page source: parquet page table (default) or "
                        "Common-Crawl WARC shards (.warc/.warc.gz)")
    b.add_argument("--llm-backend", choices=["rule", "openai"], default="rule",
                   help="extraction backend: hermetic rules (default) or the "
                        "OpenAI-compatible chat backend ($OPENAI_API_KEY etc.)")
    b.add_argument("--embed-backend", choices=["hash", "transformer", "ollama"],
                   default="hash",
                   help="embedding backend (with --embed): deterministic hash "
                        "(default), warm transformer, or Ollama HTTP")
    b.add_argument("--linking", action="store_true",
                   help="enable the fuzzy entity-linking candidate stage")
    b.add_argument("--linking-threshold", type=float, default=0.6)
    b.set_defaults(fn=cmd_build)

    t = sub.add_parser("retry")
    t.add_argument("--input", required=True)
    t.add_argument("--work", required=True)
    t.add_argument("--batch-size", type=int, default=256)
    t.add_argument("--concurrency", type=int, default=4)
    t.add_argument("--input-format", choices=["parquet", "warc"],
                   default="parquet")
    t.set_defaults(fn=cmd_retry)

    m = sub.add_parser("merge")
    m.add_argument("--graph", required=True)
    m.add_argument("--extracted", required=True)
    m.add_argument("--out", required=True)
    m.add_argument("--num-partitions", type=int, default=8)
    m.set_defaults(fn=cmd_merge)

    s = sub.add_parser("stats")
    s.add_argument("--graph", required=True)
    s.set_defaults(fn=cmd_stats)

    d = sub.add_parser("details")
    d.add_argument("--graph", required=True)
    d.add_argument("--name", required=True)
    d.add_argument("--type", default=None)
    d.set_defaults(fn=cmd_details)

    r = sub.add_parser("relations")
    r.add_argument("--graph", required=True)
    r.add_argument("--name", required=True)
    r.add_argument("--direction", choices=["in", "out", "both"], default="both")
    r.add_argument("--limit", type=int, default=20)
    r.set_defaults(fn=cmd_relations)

    q = sub.add_parser("search")
    q.add_argument("--graph", required=True)
    q.add_argument("--text", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--dim", type=int, default=256)
    q.set_defaults(fn=cmd_search)

    i = sub.add_parser("repl")
    i.add_argument("--graph", required=True)
    i.add_argument("--dim", type=int, default=64)
    i.set_defaults(fn=cmd_repl)

    a = sub.add_parser("admin")
    a.add_argument("--graph", required=True)
    a.add_argument("--clean", action="store_true")
    a.add_argument("--backup-schema", default=None)
    a.set_defaults(fn=cmd_admin)

    e = sub.add_parser("export")
    e.add_argument("--graph", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--stamp", default="")
    e.set_defaults(fn=cmd_export)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
