"""Medallion path generation + slugify.

Reference: src/api/path_generator.py:7-113 (layout :7-17, slugify
:32-59, generate_outputs :62-113). Pure path logic — identical
observable behavior, no Spark involved.

Layout: {base}/{org_slug}/{bronze|silver|gold/bi|gold/rag|quarantine}
"""

from __future__ import annotations

import os
import re


def slugify(name: str) -> str:
    """lower → [_\\s]+ → '-' → strip non [a-z0-9-] → collapse/trim '-'
    (ref path_generator.py:32-59)."""
    s = name.lower()
    s = re.sub(r"[_\s]+", "-", s)
    s = re.sub(r"[^a-z0-9-]", "", s)
    s = re.sub(r"-+", "-", s)
    return s.strip("-")


def generate_outputs(base: str, org: str, source_name: str, etl_output: str = "parquet") -> dict:
    """Every unified pipeline writes BOTH a gold/bi file and a gold/rag
    CSV (ref main.py:125-149); quarantine path for anomaly routing."""
    org_slug = slugify(org)
    ds = slugify(source_name)
    root = os.path.join(base, org_slug)
    return {
        "bronze_dir": os.path.join(root, "bronze"),
        "silver_dir": os.path.join(root, "silver"),
        "bi_path": os.path.join(root, "gold", "bi", ds, f"{ds}.{etl_output}"),
        "rag_path": os.path.join(root, "gold", "rag", ds, f"{ds}.csv"),
        "quarantine_path": os.path.join(root, "quarantine", f"{ds}_anomalies.csv"),
    }
