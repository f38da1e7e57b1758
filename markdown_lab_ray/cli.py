"""CLI: the reference's convert / sitemap / batch entry points restated
as Dataset pipelines (SURVEY §2.10).

    python -m markdown_lab_ray convert --html page.html --url https://e.com
    python -m markdown_lab_ray convert --input-parquet pages.parquet \
        --out /tmp/out --format markdown --chunks
    python -m markdown_lab_ray crawl --seeds links.txt --out /tmp/crawl \
        [--synthetic] [--rps 1.0] [--max-rounds 5]

(benchmarks live in the repo-root ``bench.py``: ``python bench.py
[--scaling]``)

Owns its Ray session (guarded init) — library code never calls
ray.init.
"""

from __future__ import annotations

import argparse
import sys


def _ensure_ray(num_cpus: int | None = None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False,
                      ignore_reinit_error=True, logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def cmd_convert(args) -> int:
    from .kernels.html_kernels import parse_html_to_document
    from .kernels.render import render_document
    from .kernels.chunker import create_semantic_chunks

    if args.html:
        with open(args.html, encoding="utf-8") as f:
            html = f.read()
        doc = parse_html_to_document(html, args.url or "https://local.file/")
        payload = render_document(doc, args.format)
        if args.out:
            with open(args.out, "w", encoding="utf-8") as f:
                f.write(payload)
        else:
            print(payload)
        if args.chunks:
            md = render_document(doc, "markdown")
            for c in create_semantic_chunks(md, args.url or ""):
                print(f"# chunk {c['id']} [{c['chunk_type']}] "
                      f"{c['char_count']} chars", file=sys.stderr)
        return 0

    if args.input_parquet:
        _ensure_ray(args.num_cpus)
        import ray.data as rd

        from .sources.io import write_chunks_jsonl, write_rendered_files
        from .stages.convert import chunk_explode_batch, parse_batch, render_batch

        ds = rd.read_parquet(args.input_parquet)
        rendered = (ds.map_batches(parse_batch, batch_format="pyarrow")
                    .map_batches(render_batch, batch_format="pyarrow",
                                 fn_kwargs=dict(fmt=args.format)))
        out = args.out or "/tmp/mlr_convert"
        write_rendered_files(rendered, out, args.format)
        if args.chunks:
            chunks = rendered.map_batches(chunk_explode_batch,
                                          batch_format="pyarrow")
            write_chunks_jsonl(chunks, out + "_chunks")
        print(f"wrote {out}")
        return 0

    print("convert: need --html or --input-parquet", file=sys.stderr)
    return 2


def cmd_crawl(args) -> int:
    _ensure_ray(args.num_cpus)
    from .config import EngineConfig
    from .pipelines.crawl import run_crawl_ray
    from .sources.synth import SiteSpec, SyntheticWeb

    cfg = EngineConfig.from_env(
        requests_per_second=args.rps, max_rounds=args.max_rounds,
        max_depth=args.max_depth)

    if args.synthetic:
        spec = SiteSpec(n_hosts=args.hosts, pages_per_host=args.pages)
        seeds = spec.seed_urls()
        web_factory = lambda: SyntheticWeb(spec)  # noqa: E731
    else:
        print("crawl: only --synthetic is supported in this sandbox "
              "(no network); the fetch tier accepts any resolver with "
              ".resolve(url)", file=sys.stderr)
        return 2

    if args.seeds:
        from .kernels.sitemap import parse_links_file
        with open(args.seeds, encoding="utf-8") as f:
            seeds = parse_links_file(f.read())

    res = run_crawl_ray(web_factory, seeds, args.out, cfg,
                        resume=args.resume)
    print(f"rounds={res.rounds} fetched={res.fetched} failed={res.failed} "
          f"out={args.out}")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="markdown_lab_ray")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("convert", help="HTML → markdown/json/xml (+chunks)")
    p.add_argument("--html", help="single HTML file")
    p.add_argument("--url", help="base URL for link resolution")
    p.add_argument("--input-parquet", help="parquet with url/html columns")
    p.add_argument("--format", default="markdown",
                   choices=["markdown", "json", "xml"])
    p.add_argument("--chunks", action="store_true")
    p.add_argument("--out")
    p.add_argument("--num-cpus", type=int)
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser("crawl", help="BSP crawl over a resolver")
    p.add_argument("--out", required=True)
    p.add_argument("--seeds", help="links.txt (default: all synthetic hosts)")
    p.add_argument("--synthetic", action="store_true", default=True)
    p.add_argument("--hosts", type=int, default=9)
    p.add_argument("--pages", type=int, default=40)
    p.add_argument("--rps", type=float, default=1.0)
    p.add_argument("--max-rounds", type=int, default=5)
    p.add_argument("--max-depth", type=int, default=2)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--num-cpus", type=int)
    p.set_defaults(fn=cmd_crawl)

    args = parser.parse_args(argv)
    code = args.fn(args)
    import ray
    if ray.is_initialized():
        ray.shutdown()
    return code


if __name__ == "__main__":
    sys.exit(main())
