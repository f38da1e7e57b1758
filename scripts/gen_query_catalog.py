"""Regenerate QUERIES.md from the queries()/oracle_sql() registries.

Usage: python scripts/gen_query_catalog.py   (run from the repo root)
"""

import re


def main() -> None:
    src = open("__ray_entry__.py").read()
    # the registry literal is `base = {...}` since the round-5 rotation
    # wrapper (falls back to a bare `return {...}` form)
    q = re.search(r"def queries\(\).*?(?:base =|return) \{(.*?)\n    \}",
                  src, re.S)
    o = re.search(r"def oracle_sql\(\).*?return \{(.*?)\n    \}", src, re.S)
    qnames = re.findall(r'"([a-z0-9_]+)": (q_[a-z0-9_]+)', q.group(1))
    onames = set(re.findall(r'"([a-z0-9_]+)":', o.group(1)))
    docs = {}
    for m in re.finditer(
            r'def (q_[a-z0-9_]+)\(sf_dir: str\):\n    """(.*?)"""',
            src, re.S):
        docs[m.group(1)] = " ".join(m.group(2).split())
    lines = [
        "# Query catalog",
        "",
        "Auto-generated from `__ray_entry__.py` "
        "(scripts/gen_query_catalog.py).",
        f"{len(qnames)} queries; {len(onames)} with a DuckDB oracle twin",
        "(driver-checked rows+schema+value-hash at sf0.01); the rest are",
        "rows-only with repo tests / fixture locks.",
        "",
        "| # | query | check | what it computes |",
        "|---|---|---|---|",
    ]
    for i, (name, fn) in enumerate(sorted(qnames), 1):
        check = "oracle" if name in onames else "rows+tests"
        d = docs.get(fn, "").replace("|", "\\|")
        if len(d) > 180:
            d = d[:177] + "..."
        lines.append(f"| {i} | `{name}` | {check} | {d} |")
    open("QUERIES.md", "w").write("\n".join(lines) + "\n")
    print(f"QUERIES.md: {len(qnames)} queries, {len(onames)} oracles")


if __name__ == "__main__":
    main()
