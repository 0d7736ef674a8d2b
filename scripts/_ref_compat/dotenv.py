"""Minimal python-dotenv shim: the reference's constant.py only calls
load_dotenv() and then os.getenv (reference constant.py:1-6)."""
import os


def load_dotenv(dotenv_path=None, **_ignored):
    path = dotenv_path or ".env"
    if not os.path.exists(path):
        return False
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            k, v = line.split("=", 1)
            os.environ.setdefault(k.strip(), v.strip().strip("'\""))
    return True
