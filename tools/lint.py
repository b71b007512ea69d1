"""Dependency-free fallback linter for `make ci`.

The CI workflow (.github/workflows/ci.yml) lints with ruff; this
environment has no ruff/flake8/pyflakes wheel baked in, so `make ci`
falls back to this script.  It covers the checks that have actually
caught bugs in this repo's CI history:

* E999 — the file must parse (``ast.parse``).
* F401 — unused imports.  ``__init__.py`` re-export files and names
  listed in ``__all__`` are exempt, matching ruff's default handling
  of explicit re-export surfaces.
* F811 — an import redefined by a later import of the same name.

Exit status is non-zero iff any finding is reported, so the Makefile
target fails the same way the workflow's ruff step would.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path


def imported_names(tree: ast.Module):
    """Yield (local_name, f811_key, node) for every MODULE-LEVEL import
    binding.  ``local_name`` is what usage (F401) checks; ``f811_key``
    is what redefinition dedupes on — for ``import a.b`` followed by
    ``import a.c`` the local binding is ``a`` both times but the imports
    are distinct (ruff does not flag them), so the key is the full
    dotted path.

    Function/method-local imports are out of scope: a scope-blind usage
    walk cannot attribute their uses correctly (they exist precisely to
    defer heavy imports or break cycles), and ruff's scope-aware F401 /
    F811 is what handles them when available."""
    for node in tree.body:
        if isinstance(node, ast.Import):
            for a in node.names:
                yield (a.asname or a.name.split(".")[0]), (a.asname or a.name), node
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                local = a.asname or a.name
                yield local, local, node


def used_names(tree: ast.AST) -> set:
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # `foo.bar` marks `foo` used via the Name node it hangs off;
            # nothing extra needed, but keep walk cheap.
            pass
    return used


def dunder_all(tree: ast.AST) -> set:
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    try:
                        return set(ast.literal_eval(node.value))
                    except (ValueError, SyntaxError):
                        return set()
    return set()


def string_forward_refs(tree: ast.AST) -> set:
    """Names inside string annotations / doctest-free string constants
    used as type hints (cheap approximation: any word in an annotation
    string counts as used)."""
    import re

    refs = set()
    for node in ast.walk(tree):
        anno = getattr(node, "annotation", None)
        if isinstance(anno, ast.Constant) and isinstance(anno.value, str):
            refs |= set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", anno.value))
    return refs


def lint_file(path: Path) -> list:
    findings = []
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: E999 syntax error: {e.msg}"]

    if path.name == "__init__.py":
        return findings  # re-export surface: F401/F811 exempt

    exported = dunder_all(tree)
    used = used_names(tree) | string_forward_refs(tree)

    seen: dict = {}
    for name, key, node in imported_names(tree):
        if key in seen and seen[key] != node.lineno:
            findings.append(
                f"{path}:{node.lineno}: F811 redefinition of imported "
                f"'{name}' (first at line {seen[key]})"
            )
        seen.setdefault(key, node.lineno)

    for name, _key, node in imported_names(tree):
        if name == "_":
            continue
        if name not in used and name not in exported:
            findings.append(f"{path}:{node.lineno}: F401 '{name}' imported but unused")
    return findings


def main(argv) -> int:
    roots = [Path(a) for a in argv[1:]] or [Path(".")]
    files = []
    for r in roots:
        files += [r] if r.is_file() else sorted(r.rglob("*.py"))
    findings = []
    for f in files:
        findings += lint_file(f)
    for line in findings:
        print(line)
    print(f"lint: {len(files)} files, {len(findings)} findings")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
