#!/bin/bash
# Fetch the paper datasets (reference parity: /root/reference/download_data.sh).
# Auditory two-probe LFP: Zenodo record 5137888 (text files per electrode).
# Neuropixels: Zenodo 10.5281/zenodo.5150708 (NWB pair), extracted with
#   python -c "from gpcsd_tpu.io.nwb import extract_probe; ..."
set -e
DATA_ROOT="${1:-data}"
mkdir -p "$DATA_ROOT/auditory_lfp" "$DATA_ROOT/neuropixels"

aud="$DATA_ROOT/auditory_lfp"
for f in time.txt medial_evoked_mua.txt lateral_evoked_mua.txt; do
    [ -f "$aud/$f" ] || wget -q "https://zenodo.org/record/5137888/files/$f" -P "$aud/"
done
for i in $(seq 1 24); do
    for probe in lateral medial; do
        f="${probe}_electrode${i}.txt"
        [ -f "$aud/$f" ] || wget -q "https://zenodo.org/record/5137888/files/$f" -P "$aud/"
    done
done

np="$DATA_ROOT/neuropixels"
for f in mouse405751.lfp.nwb mouse405751.spikes.nwb; do
    [ -f "$np/$f" ] || wget "https://zenodo.org/record/5150708/files/$f" -P "$np/"
done
echo "data in $DATA_ROOT"
