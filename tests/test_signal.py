"""Signal-processing parity tests against scipy (the reference's backend)."""

import numpy as np
import scipy.signal as ss

from gpcsd_tpu import signal as gsig


class TestSOSFilter:
    def test_sosfilt_matches_scipy(self, rng):
        x = rng.normal(size=(3, 256))
        sos = gsig.butter_bandpass_sos(8, 12, 100.0, order=4)
        got = np.asarray(gsig.sosfilt(sos, x))
        want = ss.sosfilt(sos, x, axis=-1)
        assert np.allclose(got, want, atol=1e-10)

    def test_sosfiltfilt_close_to_scipy(self, rng):
        x = rng.normal(size=(2, 400)).cumsum(axis=-1)
        sos = gsig.butter_bandpass_sos(8, 12, 500.0, order=4)
        got = np.asarray(gsig.sosfiltfilt(sos, x))
        want = ss.sosfiltfilt(sos, x, axis=-1)
        # padding details differ slightly from scipy's exact initial-state
        # logic; interior must agree tightly
        assert np.allclose(got[:, 50:-50], want[:, 50:-50], atol=1e-3)

    def test_zero_phase(self, rng):
        """filtfilt must not shift a band-limited signal's phase."""
        fs = 250.0
        t = np.arange(1000) / fs
        x = np.sin(2 * np.pi * 10.0 * t)
        y = np.asarray(gsig.bandpass_filtfilt(x, 8, 12, fs))
        # cross-correlation peak at zero lag
        xc = np.correlate(y[100:-100], x[100:-100], "same")
        assert abs(int(np.argmax(xc)) - len(xc) // 2) <= 1


class TestHilbert:
    def test_matches_scipy(self, rng):
        x = rng.normal(size=(4, 128))
        got = np.asarray(gsig.hilbert(x))
        want = ss.hilbert(x, axis=-1)
        assert np.allclose(got, want, atol=1e-9)

    def test_phase_of_sinusoid(self):
        fs = 100.0
        t = np.arange(512) / fs
        x = np.cos(2 * np.pi * 5.0 * t)
        ph = np.asarray(gsig.instantaneous_phase(x))
        # unwrapped phase advances at 2*pi*5 rad/s
        slope = np.polyfit(t[50:-50], np.unwrap(ph)[50:-50], 1)[0]
        assert np.allclose(slope, 2 * np.pi * 5.0, rtol=1e-3)


class TestPLV:
    def test_perfectly_locked(self, rng):
        base = rng.uniform(0, 2 * np.pi, size=(1, 200))
        offs = np.array([[0.0], [1.0], [2.5]])
        phases = (base + offs) % (2 * np.pi)
        plv = np.asarray(gsig.plv_matrix(phases))
        assert np.allclose(plv, 1.0, atol=1e-10)

    def test_independent_phases_low(self, rng):
        phases = rng.uniform(0, 2 * np.pi, size=(4, 5000))
        plv = np.asarray(gsig.plv_matrix(phases))
        off = plv[~np.eye(4, dtype=bool)]
        assert off.max() < 0.08
        assert np.allclose(np.diag(plv), 1.0)


class TestPeriodogram:
    def test_matches_scipy(self, rng):
        x = rng.normal(size=(2, 300))
        f_got, p_got = gsig.periodogram(x, fs=250.0)
        f_want, p_want = ss.periodogram(x, fs=250.0, axis=-1)
        assert np.allclose(np.asarray(f_got), f_want)
        assert np.allclose(np.asarray(p_got), p_want, atol=1e-10)

    def test_peak_at_signal_frequency(self):
        fs = 200.0
        t = np.arange(1024) / fs
        x = np.sin(2 * np.pi * 17.0 * t)
        f, p = gsig.periodogram(x, fs=fs)
        assert abs(float(np.asarray(f)[int(np.argmax(np.asarray(p)))]) - 17.0) < 0.3
