"""Git introspection (reference: /root/reference/jorvik/utils/git.py:12-48).

Used by the GIT_BRANCH isolation provider: the current branch of the repo
containing the *calling code file* (not the process cwd), so notebook-style
entry points resolve the right repo.
"""

from __future__ import annotations

import os
import subprocess

from jorvik_spark.utils.paths import get_codefile_path


class GitUtilsError(Exception):
    """Raised when the current git branch cannot be determined
    (reference git.py:6,43)."""


def get_current_git_branch() -> str:
    """Return the current branch name of the repo that owns the calling
    code file.

    Raises :class:`GitUtilsError` when the git client is missing, the
    directory is not a repo, or the subprocess fails — so a broken git
    environment can never silently yield an empty isolation context and
    route feature-branch writes to production paths. An empty string is
    returned only on a *successful* call with no symbolic branch
    (detached HEAD), matching ``git branch --show-current``.
    """
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
    except (subprocess.SubprocessError, OSError) as e:
        raise GitUtilsError(
            f"Could not determine the current git branch in {code_dir}: {e}"
        ) from e
    return out.stdout.strip()
