"""Regression guard: `from multimedia_indexing_ray...` must never appear
where a Ray worker executes it (nested closures shipped inside tasks,
methods of actor/stage classes).  The package is shipped to workers via
cloudpickle pickle-by-value, which serializes code objects but NOT
worker-side import statements — a lazy in-closure import crashes every
worker whose driver cwd is not the repo root (bit us twice)."""

import ast
import glob
import os

PKG = "multimedia_indexing_ray"
ROOT = os.path.join(os.path.dirname(__file__), "..", PKG)


def _violations(path):
    tree = ast.parse(open(path).read())
    bad = []

    def walk(node, func_depth, in_class):
        for child in ast.iter_child_nodes(node):
            fd, ic = func_depth, in_class
            if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef)):
                fd = func_depth + 1
            if isinstance(child, ast.ClassDef):
                ic = True
            if isinstance(child, (ast.Import, ast.ImportFrom)):
                names = (
                    [child.module or ""]
                    if isinstance(child, ast.ImportFrom)
                    else [a.name for a in child.names]
                )
                if any(n and n.split(".")[0] == PKG for n in names):
                    # worker-executed scopes: nested funcs, class methods.
                    # functions/ modules are codec/kernel code — every
                    # top-level function there is worker-reachable (a
                    # stage method may call it), so ANY function-level
                    # package import is banned (bit us a third time:
                    # avi.decode_dib_frame's lazy bmp import crashed
                    # MediaPHasher workers off-repo-cwd)
                    in_functions_pkg = f"{os.sep}functions{os.sep}" in path
                    if (
                        func_depth >= 2
                        or (in_class and func_depth >= 1)
                        or (in_functions_pkg and func_depth >= 1)
                    ):
                        bad.append((path, child.lineno))
            walk(child, fd, ic)

    walk(tree, 0, False)
    return bad


def test_no_package_imports_in_worker_scopes():
    bad = []
    for path in glob.glob(os.path.join(ROOT, "**", "*.py"), recursive=True):
        bad.extend(_violations(path))
    assert not bad, f"worker-side package imports (move to module top): {bad}"
