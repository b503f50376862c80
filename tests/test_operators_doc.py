"""docs/OPERATORS.md is GENERATED from the registry (VERDICT r9 #8);
this test pins it fresh — a new/renamed/retagged query or a flipped
oracle status without regenerating the page fails here. Regenerate:
`python tools/gen_operators_doc.py`."""

import importlib.util
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_operators_doc_is_fresh():
    spec = importlib.util.spec_from_file_location(
        "gen_operators_doc", os.path.join(ROOT, "tools", "gen_operators_doc.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    path = os.path.join(ROOT, "docs", "OPERATORS.md")
    assert os.path.exists(path), "docs/OPERATORS.md missing — run tools/gen_operators_doc.py"
    with open(path) as fh:
        on_disk = fh.read()
    assert on_disk == mod.render(), (
        "docs/OPERATORS.md is stale — regenerate with "
        "`python tools/gen_operators_doc.py`"
    )
