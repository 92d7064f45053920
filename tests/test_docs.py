"""Documentation stays truthful: docs/API.md's import blocks must run.

The API reference promises every symbol it shows is importable as
written; executing the fenced python blocks catches renames/removals
the moment they happen instead of shipping a stale reference.
"""

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_api_md_import_blocks_execute():
    src = open(os.path.join(REPO, "docs", "API.md")).read()
    blocks = re.findall(r"```python\n(.*?)```", src, re.S)
    assert len(blocks) >= 8, "API.md lost its code blocks?"
    ns = {}
    for block in blocks:
        exec(compile(block, "docs/API.md", "exec"), ns)  # noqa: S102
    # spot-check a few load-bearing promises
    for name in ("ModelConfig", "load_predictor", "make_server",
                 "create_study", "fit", "make_mesh"):
        assert name in ns, f"API.md no longer imports {name}"


def test_readme_and_doc_links_resolve():
    """Every relative markdown link in README/docs points at a real
    file — broken cross-references are the most common doc rot."""
    for md in ("README.md", os.path.join("docs", "API.md"),
               os.path.join("docs", "SERVING.md"),
               os.path.join("docs", "MIGRATION.md")):
        src = open(os.path.join(REPO, md)).read()
        for target in re.findall(r"\]\(([^)#]+)\)", src):
            if "://" in target:
                continue  # external URL
            base = os.path.dirname(os.path.join(REPO, md))
            assert (os.path.exists(os.path.join(base, target))
                    or os.path.exists(os.path.join(REPO, target))), (
                f"{md} links to missing {target}")
