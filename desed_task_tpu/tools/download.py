"""Streaming HTTP download utility (replacement for desed_task/utils/
download.py:1-24). Gated: raises a clear error in zero-egress environments."""

from __future__ import annotations

from pathlib import Path


def download_from_url(url: str, destination, chunk_size: int = 1 << 20) -> str:
    import requests

    destination = Path(destination)
    destination.parent.mkdir(parents=True, exist_ok=True)
    try:
        with requests.get(url, stream=True, timeout=30) as r:
            r.raise_for_status()
            total = int(r.headers.get("content-length", 0))
            done = 0
            with open(destination, "wb") as f:
                for chunk in r.iter_content(chunk_size=chunk_size):
                    f.write(chunk)
                    done += len(chunk)
                    if total:
                        print(f"\r{destination.name}: {done/total:6.1%}", end="")
            print()
    except requests.RequestException as e:
        raise RuntimeError(
            f"download of {url} failed ({e}); this environment may have no "
            "network egress — fetch the file manually"
        ) from e
    return str(destination)


def audit_missing_files(meta_tsv, audio_folder, out_tsv) -> "pd.DataFrame":
    """Record metadata clips absent from disk to a recovery tsv.

    Parity with the reference's missing-file bookkeeping after YouTube-sourced
    downloads (generate_dcase_task4_2024.py:183-222 /
    desed.download_audioset_files_from_csv missing_files_tsv): clips listed in
    `meta_tsv` but with no wav in `audio_folder` are written to `out_tsv`
    (one `filename` per row, deduplicated, original order) so the user can
    re-download or send the list to the task organisers. Returns the missing
    rows; writes nothing when nothing is missing.
    """
    import pandas as pd

    df = pd.read_csv(meta_tsv, sep="\t")
    col = "filename" if "filename" in df.columns else df.columns[0]
    present = {p.name for p in Path(audio_folder).glob("*.wav")}
    names = df[col].astype(str).map(lambda s: Path(s).name)
    missing = df[~names.isin(present)].drop_duplicates(subset=[col])
    if len(missing):
        out = Path(out_tsv)
        out.parent.mkdir(parents=True, exist_ok=True)
        missing.to_csv(out, sep="\t", index=False)
    return missing


def generate_tsv_wav_durations(audio_dir, out_tsv) -> "pd.DataFrame":
    """Write a filename/duration tsv for a folder of wavs (parity with
    recipes/*/local/utils.py generate_tsv_wav_durations :204), using the
    native header reader when built."""
    import pandas as pd

    from ..data import native
    from ..data.audio_io import read_wav

    rows = []
    for wav in sorted(Path(audio_dir).glob("*.wav")):
        if native.available():
            try:
                rate, _, frames = native.info(wav)
                rows.append((wav.name, frames / rate))
                continue
            except (ValueError, RuntimeError):
                pass
        audio, rate = read_wav(wav)
        n = audio.shape[-1]
        rows.append((wav.name, n / rate))
    df = pd.DataFrame(rows, columns=["filename", "duration"])
    Path(out_tsv).parent.mkdir(parents=True, exist_ok=True)
    df.to_csv(out_tsv, sep="\t", index=False)
    return df
