"""Git introspection (reference: /root/reference/jorvik/utils/git.py:12-48).

Used by the GIT_BRANCH isolation provider: the current branch of the repo
containing the *calling code file* (not the process cwd), so notebook-style
entry points resolve the right repo.
"""

from __future__ import annotations

import os
import subprocess

from jorvik_spark.utils.paths import get_codefile_path


def get_current_git_branch() -> str:
    """Return the current branch name of the repo that owns the calling
    code file; empty string when not in a git repo."""
    code_dir = os.path.dirname(os.path.abspath(get_codefile_path())) or "."
    try:
        out = subprocess.run(
            ["git", "branch", "--show-current"],
            cwd=code_dir,
            capture_output=True,
            text=True,
            timeout=30,
            check=True,
        )
        return out.stdout.strip()
    except (subprocess.SubprocessError, OSError):
        return ""
