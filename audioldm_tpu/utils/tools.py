"""General utilities (reference component #9, script/utilities/tools.py):
prompt-list -> JSON dataset builder, checkpoint discovery, file integrity,
nested-config retrieval. The reference's MD5'd checkpoint *downloader*
(tools.py:128-154) is gated behind local-file verification here — this
framework runs in zero-egress environments; fetching is the deployment
system's job."""

from __future__ import annotations

import hashlib
import json
import os
import re
from typing import Any, Optional, Sequence


def build_dataset_json_from_list(prompts: Sequence[str], path: Optional[str] = None) -> dict:
    """Prompt list -> the {"data": [{"wav": "", "caption": ...}]} layout the
    data pipeline ingests (reference: tools.py:53-67)."""
    data = {"data": [{"wav": "", "caption": p} for p in prompts]}
    if path:
        with open(path, "w") as f:
            json.dump(data, f, indent=2)
    return data


def get_restore_step(checkpoint_dir: str) -> Optional[int]:
    """Largest step among ``checkpoint-{N}`` subdirs / orbax step dirs
    (reference intent: tools.py:107-125 — present but unused there; wired
    into Trainer.restore here)."""
    if not os.path.isdir(checkpoint_dir):
        return None
    steps = []
    for name in os.listdir(checkpoint_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name) or re.fullmatch(r"(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def md5_file(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def verify_checkpoint(path: str, expected_md5: str) -> bool:
    """Local-file integrity check (the verification half of the reference's
    downloader, tools.py:146-154)."""
    return os.path.exists(path) and md5_file(path) == expected_md5


def retrieve(obj: Any, path: str, default: Any = None, sep: str = "/") -> Any:
    """Nested lookup ``retrieve(cfg, "train/learning_rate")`` over dicts,
    lists and attribute objects (capability of the reference's ``retrieve``,
    tools.py:172-252, without its callable-expansion machinery)."""
    cur = obj
    for key in path.split(sep):
        if isinstance(cur, dict):
            if key not in cur:
                return default
            cur = cur[key]
        elif isinstance(cur, (list, tuple)):
            try:
                cur = cur[int(key)]
            except (ValueError, IndexError):
                return default
        elif hasattr(cur, key):
            cur = getattr(cur, key)
        else:
            return default
    return cur
