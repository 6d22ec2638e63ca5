"""Hermetic PEP 427 wheel builder (stdlib only).

`pip install .` / `pip wheel .` need the `wheel` package on
setuptools < 70.1; a hermetic sandbox without a package index cannot
install it. A wheel is just a zip with a dist-info directory, so this
script builds `dist/solana_event_stream_spark-<ver>-py3-none-any.whl`
from pyproject.toml with nothing but the standard library — the same
artifact `python -m build` would produce for this pure-python layout,
suitable for `pip install <whl>` (installing FROM a wheel needs no
extra tooling) and for shipping to executors via
`spark.sparkContext.addPyFile` / `--py-files`.

Usage:  python scripts/build_wheel.py   (from the repo root or anywhere)
"""

from __future__ import annotations

import base64
import hashlib
import os
import re
import tomllib
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "solana_event_stream_spark"


def _version() -> str:
    init = open(os.path.join(REPO, PACKAGE, "__init__.py")).read()
    return re.search(r'__version__\s*=\s*"([^"]+)"', init).group(1)


def _metadata(proj: dict, version: str) -> str:
    lines = [
        "Metadata-Version: 2.1",
        f"Name: {proj['name']}",
        f"Version: {version}",
        f"Summary: {proj.get('description', '')}",
        f"Requires-Python: {proj.get('requires-python', '')}",
    ]
    if "license" in proj and "text" in proj["license"]:
        lines.append(f"License: {proj['license']['text']}")
    for dep in proj.get("dependencies", []):
        lines.append(f"Requires-Dist: {dep}")
    for extra, deps in proj.get("optional-dependencies", {}).items():
        lines.append(f"Provides-Extra: {extra}")
        for dep in deps:
            lines.append(f'Requires-Dist: {dep}; extra == "{extra}"')
    readme = proj.get("readme")
    body = ""
    if readme and os.path.isfile(os.path.join(REPO, readme)):
        lines.append("Description-Content-Type: text/markdown")
        body = "\n" + open(os.path.join(REPO, readme)).read()
    return "\n".join(lines) + "\n" + body


def _record_line(arcname: str, data: bytes) -> str:
    digest = base64.urlsafe_b64encode(
        hashlib.sha256(data).digest()).rstrip(b"=").decode()
    return f"{arcname},sha256={digest},{len(data)}"


def build() -> str:
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as fh:
        proj = tomllib.load(fh)["project"]
    version = _version()
    dist = proj["name"].replace("-", "_")
    tag = "py3-none-any"
    distinfo = f"{dist}-{version}.dist-info"
    os.makedirs(os.path.join(REPO, "dist"), exist_ok=True)
    whl_path = os.path.join(REPO, "dist", f"{dist}-{version}-{tag}.whl")

    entries: list[tuple[str, bytes]] = []
    for root, dirs, files in os.walk(os.path.join(REPO, PACKAGE)):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in sorted(files):
            if f.endswith((".pyc", ".pyo")):
                continue
            full = os.path.join(root, f)
            arc = os.path.relpath(full, REPO).replace(os.sep, "/")
            with open(full, "rb") as fh:
                entries.append((arc, fh.read()))

    entries.append((f"{distinfo}/METADATA",
                    _metadata(proj, version).encode()))
    entries.append((f"{distinfo}/WHEEL",
                    ("Wheel-Version: 1.0\n"
                     "Generator: build_wheel.py (hermetic)\n"
                     "Root-Is-Purelib: true\n"
                     f"Tag: {tag}\n").encode()))
    record = "\n".join(_record_line(a, d) for a, d in entries)
    record += f"\n{distinfo}/RECORD,,\n"

    with zipfile.ZipFile(whl_path, "w", zipfile.ZIP_DEFLATED) as z:
        for arc, data in entries:
            z.writestr(zipfile.ZipInfo(arc, (2023, 1, 1, 0, 0, 0)), data)
        z.writestr(zipfile.ZipInfo(f"{distinfo}/RECORD",
                                   (2023, 1, 1, 0, 0, 0)), record)
    return whl_path


if __name__ == "__main__":
    print(build())
