"""NWB extraction unit tests against a synthetic h5 pair.

Mirrors the structure of the Zenodo mouse files the reference reads
(``/root/reference/neuropixels/extract_data.py``): LFP timeseries +
electrode indices in the ``.lfp.nwb`` file, unit CCF structures and
stimulus timestamps in the ``.spikes.nwb`` file.
"""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from gpcsd_tpu.io.nwb import (
    LFP_SAMPLE_RATE,
    ROI_CODES,
    channel_location,
    channel_region_labels,
    extract_probe,
)

PROBE = "probeC"
N_CH = 12  # recorded channels (subset of the 384 probe sites)


@pytest.fixture
def nwb_pair(tmp_path):
    """Synthetic (lfp.nwb, spikes.nwb) pair: 12 recorded channels, units
    labeling channels 0-3 visual, 4-5 CA, 6 thalamus; 3 flash trials."""
    nsamp = 3 * LFP_SAMPLE_RATE
    rng = np.random.default_rng(0)
    lfp_path = tmp_path / "mouse.lfp.nwb"
    spk_path = tmp_path / "mouse.spikes.nwb"

    with h5py.File(lfp_path, "w") as f:
        g = f.create_group(f"acquisition/timeseries/{PROBE}")
        data = rng.normal(size=(nsamp, N_CH))
        # channel 0 carries a trial-locked square pulse so we can verify
        # epoch alignment end-to-end
        data[:, 0] = 0.0
        ts = np.arange(nsamp) / LFP_SAMPLE_RATE
        for onset in (1.0, 1.6, 2.2):
            i0 = int(onset * LFP_SAMPLE_RATE)
            data[i0 : i0 + 50, 0] = 7.0
        g.create_dataset("data", data=data)
        g.create_dataset("timestamps", data=ts)
        g.create_dataset("electrode_idx", data=np.arange(N_CH))

    with h5py.File(spk_path, "w") as f:
        proc = f.create_group(f"processing/{PROBE}")
        structures = {
            0: b"VISp", 1: b"VISp", 2: b"VISp5", 3: b"VISp6a",
            4: b"CA1", 5: b"CA3", 6: b"TH", 7: None,  # 7: no ccf entry
        }
        proc.create_dataset("unit_list", data=np.arange(len(structures)))
        for unit, struct in structures.items():
            ug = proc.create_group(f"UnitTimes/{unit}")
            ug.create_dataset("channel", data=unit)  # unit u sits on channel u
            if struct is not None:
                ug.create_dataset("ccf_structure", data=struct)
        st = f.create_group("stimulus/presentation/flash_250ms_1")
        st.create_dataset(
            "timestamps", data=np.array([[1.0, 1.25], [1.6, 1.85], [2.2, 2.45]])
        )

    return str(lfp_path), str(spk_path)


def test_channel_region_labels(nwb_pair):
    _, spk = nwb_pair
    with h5py.File(spk, "r") as f:
        labels = channel_region_labels(f, PROBE)
    assert labels.shape == (384,)
    assert list(labels[:8]) == [1, 1, 1, 1, 2, 2, 4, 0]
    assert (labels[8:] == 0).all()


def test_extract_probe_selects_visual_channels(nwb_pair, tmp_path):
    lfp, spk = nwb_pair
    out_path = str(tmp_path / "viz.pkl")
    out = extract_probe(lfp, spk, PROBE, out_path=out_path, roi_name="V1")
    # channels 0-3 are visual
    assert out["y"].shape == (4, LFP_SAMPLE_RATE, 3)
    assert out["x"].shape == (4, 2)
    assert out["roi"] == "V1"
    assert out["fs"] == LFP_SAMPLE_RATE
    assert list(out["regions"][:8]) == [1, 1, 1, 1, 2, 2, 4, 0]
    # geometry matches the channel map for the kept channels
    expect = np.array([channel_location(c)[0] for c in range(4)])
    np.testing.assert_allclose(out["x"], expect)
    # epoch alignment: the trial-locked pulse lands right after t=0 on
    # the visual channel that carries it, identically across trials
    t = out["t"].reshape(-1)
    post = (t > 0.0) & (t < 0.02 - 1e-9)
    pulse = 7.0 * 0.195  # epoching converts to microvolts (gain 0.195)
    assert (out["y"][0][post, :] > 0.9 * pulse).all()
    assert not (np.abs(out["y"][0][t < -0.01, :]) > 0.9 * pulse).any()
    # pickle round-trip wrote the same schema
    import pickle

    with open(out_path, "rb") as f:
        saved = pickle.load(f)
    assert set(saved) == set(out)
    np.testing.assert_allclose(saved["y"], out["y"])


def test_extract_probe_region_none_keeps_all(nwb_pair):
    lfp, spk = nwb_pair
    out = extract_probe(lfp, spk, PROBE, region=None)
    assert out["y"].shape == (N_CH, LFP_SAMPLE_RATE, 3)
    assert out["roi"] == "all"
