#!/usr/bin/env python
"""Mechanical splitter: fast_carpenter_spark/queries.py (6.9k lines) ->
fast_carpenter_spark/queries/ package of per-domain modules (round-3
VERDICT item 5: no file > ~1.5k lines, behavior unchanged).

The split is by line ranges of the existing file; cross-module name
references are computed from the AST (top-level definitions per chunk vs
Name loads per chunk) and emitted as explicit imports.  The script ABORTS
before writing anything if it finds (a) duplicate top-level names across
chunks, or (b) a forward reference (an earlier chunk using a later chunk's
name), both of which would change semantics.

Usage: python scripts/split_queries.py [--check]   (--check: analyze only)
"""

from __future__ import annotations

import ast
import builtins
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "fast_carpenter_spark", "queries.py")
PKG = os.path.join(REPO, "fast_carpenter_spark", "queries")

# (module_name, [(start_line, end_line), ...])  1-indexed inclusive.
CHUNKS = [
    ("_common", [(1, 64)]),
    ("tiles_q", [(65, 137), (348, 1679)]),
    ("streaming_q", [(138, 347)]),
    ("core_q", [(1680, 2463)]),
    ("spatial_q", [(2464, 3056)]),
    ("binned_q", [(3057, 3218)]),
    ("traindata_q", [(3219, 4198)]),
    ("snapshot_q", [(4199, 5078)]),
    ("govern_q", [(5079, 6146)]),
    ("shaping_q", [(6147, 6667)]),
    ("registry", [(6668, None)]),
]

BUILTINS = set(dir(builtins)) | {"__file__", "__name__", "__doc__"}


def top_level_defs(tree: ast.Module) -> set[str]:
    names: set[str] = set()
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names.add(node.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                for n in ast.walk(t):
                    if isinstance(n, ast.Name):
                        names.add(n.id)
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            names.add(node.target.id)
        elif isinstance(node, ast.Import):
            for a in node.names:
                names.add((a.asname or a.name).split(".")[0])
        elif isinstance(node, ast.ImportFrom):
            for a in node.names:
                names.add(a.asname or a.name)
    return names


def used_names(tree: ast.Module) -> set[str]:
    return {
        n.id
        for n in ast.walk(tree)
        if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load)
    }


# Shared helpers used across chunk boundaries in both directions: relocated
# to _common so no chunk forward-references a later one.
RELOCATE = {"_load_events", "SESSION_GAP_US", "_source_fingerprint_tag"}


def main() -> None:
    check_only = "--check" in sys.argv
    full_src = open(SRC).read()
    lines = full_src.splitlines(keepends=True)

    # carve RELOCATE definitions out of their home chunks, append to _common
    full_tree = ast.parse(full_src)
    relocated_src: list[str] = []
    blanked: set[int] = set()
    for node in full_tree.body:
        names = top_level_defs(ast.Module(body=[node], type_ignores=[]))
        if names & RELOCATE:
            relocated_src.append(
                "".join(lines[node.lineno - 1 : node.end_lineno])
            )
            blanked.update(range(node.lineno - 1, node.end_lineno))
    lines = ["\n" if i in blanked else l for i, l in enumerate(lines)]

    chunk_src: dict[str, str] = {}
    for name, ranges in CHUNKS:
        parts = []
        for a, b in ranges:
            b = len(lines) if b is None else b
            parts.append("".join(lines[a - 1 : b]))
        if name == "_common":
            parts.append("\n\n" + "\n\n".join(relocated_src))
        chunk_src[name] = "\n".join(parts)

    trees = {n: ast.parse(s) for n, s in chunk_src.items()}
    defs = {n: top_level_defs(t) for n, t in trees.items()}

    # duplicate top-level names across chunks would change binding semantics
    seen: dict[str, str] = {}
    dups = []
    for n, _ in CHUNKS:
        for d in defs[n]:
            if d in seen and n != "_common" and seen[d] != "_common":
                dups.append((d, seen[d], n))
            seen[d] = n
    if dups:
        print("DUPLICATE top-level names across chunks:", dups)
        sys.exit(1)

    order = [n for n, _ in CHUNKS]
    owner: dict[str, str] = {}
    for n in order:
        for d in defs[n]:
            owner.setdefault(d, n)

    imports: dict[str, dict[str, list[str]]] = {}
    forward = []
    for i, n in enumerate(order):
        need = (used_names(trees[n]) - defs[n]) - BUILTINS
        mod_imports: dict[str, list[str]] = {}
        for name in sorted(need):
            src_mod = owner.get(name)
            if src_mod is None or src_mod == n:
                continue
            if order.index(src_mod) > i:
                forward.append((n, name, src_mod))
            else:
                mod_imports.setdefault(src_mod, []).append(name)
        imports[n] = mod_imports

    for n in order:
        n_lines = chunk_src[n].count("\n")
        print(f"{n}: {n_lines} lines; "
              f"imports {{{', '.join(f'{k}:{len(v)}' for k, v in imports[n].items())}}}")
    if forward:
        print("FORWARD references (would be circular):")
        for f in forward:
            print("  ", f)
        sys.exit(1)
    if check_only:
        print("analysis clean")
        return

    os.makedirs(PKG, exist_ok=True)
    for n, _ in CHUNKS:
        hdr = ""
        if n != "_common":
            hdr = (
                f'"""Split from the original single-module queries.py '
                f"(round-4 refactor); see queries/__init__.py for the "
                f'public surface."""\n\nfrom __future__ import annotations\n\n'
            )
            for src_mod in order:
                if src_mod in imports[n] and imports[n][src_mod]:
                    names = imports[n][src_mod]
                    hdr += (
                        f"from .{src_mod} import (\n    "
                        + ",\n    ".join(names)
                        + ",\n)\n"
                    )
            hdr += "\n"
        with open(os.path.join(PKG, f"{n}.py"), "w") as f:
            f.write(hdr + chunk_src[n])

    # __init__: re-export EVERY top-level name so existing imports
    # (`from fast_carpenter_spark.queries import X`) keep working.
    init = [
        '"""Query + oracle registry (package form of the original queries.py).',
        "",
        "Every top-level name of the former single module is re-exported here,",
        "so `from fast_carpenter_spark.queries import <anything>` is unchanged.",
        '"""',
        "",
    ]
    for n in order:
        public = sorted(d for d in defs[n] if owner[d] == n)
        if public:
            init.append(
                f"from .{n} import (\n    " + ",\n    ".join(public) + ",\n)"
            )
    with open(os.path.join(PKG, "__init__.py"), "w") as f:
        f.write("\n".join(init) + "\n")
    os.remove(SRC)
    print(f"wrote {PKG}/ and removed {SRC}")


if __name__ == "__main__":
    main()
