"""Fetch the public MedleyDB stem-metadata YAMLs.

The reference toolkit vendored ~330 YAML metafiles from the MedleyDB project
(`/root/reference/assets/medleydb_metafiles/`, sourced from
https://github.com/marl/medleydb `medleydb/data/Metadata/*.yaml`). This repo
vendors a small sample (enough to run and test the pipeline) and fetches the
rest on demand with this script::

    python -m pytorch_sound_tpu.scripts.fetch_medleydb_meta [out_dir]

``out_dir`` defaults to the bundled ``assets/medleydb_metafiles`` directory.
Already-present files are skipped, so the fetch is resumable/idempotent.
"""

import json
import os
import sys
import time
import urllib.request

GITHUB_API_LISTING = ('https://api.github.com/repos/marl/medleydb/contents/'
                      'medleydb/data/Metadata')
RAW_BASE = ('https://raw.githubusercontent.com/marl/medleydb/master/'
            'medleydb/data/Metadata/')

DEFAULT_OUT_DIR = os.path.abspath(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..', '..',
    'assets', 'medleydb_metafiles'))


def _get(url: str, retries: int = 3, timeout: float = 30.0) -> bytes:
    last_err = None
    for attempt in range(retries):
        try:
            req = urllib.request.Request(url, headers={'User-Agent': 'pytorch-sound-tpu'})
            with urllib.request.urlopen(req, timeout=timeout) as r:
                return r.read()
        except Exception as e:   # noqa: BLE001 - network errors retried
            last_err = e
            time.sleep(2.0 * (attempt + 1))
    raise RuntimeError('failed to fetch {}: {!r}'.format(url, last_err))


def list_metadata_files() -> list:
    """Names of every *_METADATA.yaml in the upstream repository."""
    listing = json.loads(_get(GITHUB_API_LISTING).decode('utf-8'))
    return sorted(entry['name'] for entry in listing
                  if entry['name'].endswith('.yaml'))


def fetch(out_dir: str = DEFAULT_OUT_DIR) -> int:
    """Download all missing metafiles into ``out_dir``; returns #downloaded."""
    os.makedirs(out_dir, exist_ok=True)
    names = list_metadata_files()
    print('{} metafiles upstream'.format(len(names)))
    fetched = 0
    for name in names:
        dst = os.path.join(out_dir, name)
        if os.path.exists(dst):
            continue
        data = _get(RAW_BASE + name)
        tmp = dst + '.part'
        with open(tmp, 'wb') as w:
            w.write(data)
        os.replace(tmp, dst)
        fetched += 1
        if fetched % 25 == 0:
            print('  fetched {}...'.format(fetched))
    print('done: {} new, {} total present'.format(
        fetched, len([f for f in os.listdir(out_dir) if f.endswith('.yaml')])))
    return fetched


if __name__ == '__main__':
    fetch(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT_DIR)
