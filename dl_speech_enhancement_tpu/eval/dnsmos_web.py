"""DNSMOS scoring against the Azure web API (reference DNSMOS/dnsmos.py).

Posts base64 wav payloads to the DNSMOS service endpoints; requires network
access and a subscription key (the evaluation environment here has no
egress — the local JAX scorer in eval/dnsmos.py is the primary path).
"""

from __future__ import annotations

import base64
import os


# The public endpoints from the reference script (DNSMOS/dnsmos.py).
SCORING_URI_DNSMOS = "https://dnsmos.azurewebsites.net/score"
SCORING_URI_DNSMOS_P835 = "https://dnsmos.azurewebsites.net/v1/dnsmosp835/score"


def score_file(fpath: str, key: str | None = None, p835: bool = True) -> dict:
    """Score one wav via the web API. ``key`` defaults to $DNSMOS_KEY."""
    import requests

    key = key or os.environ.get("DNSMOS_KEY")
    if not key:
        raise RuntimeError("DNSMOS web scoring needs a subscription key "
                           "(pass key= or set DNSMOS_KEY)")
    with open(fpath, "rb") as f:
        payload = {"data": base64.b64encode(f.read()).decode("ascii"),
                   "filename": os.path.basename(fpath)}
    uri = SCORING_URI_DNSMOS_P835 if p835 else SCORING_URI_DNSMOS
    headers = {"Content-Type": "application/json",
               "Authorization": f"Basic {key}"}
    resp = requests.post(uri, json=payload, headers=headers, timeout=60)
    resp.raise_for_status()
    return resp.json()


def score_dir(testset_dir: str, key: str | None = None, p835: bool = True):
    import glob

    rows = []
    for clip in sorted(glob.glob(os.path.join(testset_dir, "**", "*.wav"),
                                 recursive=True)):
        rows.append({"filename": clip, **score_file(clip, key, p835)})
    return rows
