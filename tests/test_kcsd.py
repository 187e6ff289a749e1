"""Native kCSD baseline tests."""

import numpy as np
import pytest

from gpcsd_tpu.models.kcsd import KCSD1D
from gpcsd_tpu.ops.forward import fwd_model_1d


def _template(z, t):
    z = np.asarray(z).reshape(-1, 1)
    t = np.asarray(t).reshape(1, -1)
    v = np.exp(-((z - 600) ** 2) / (2 * 150**2)) * np.exp(-((t - 20) ** 2) / (2 * 4**2))
    v -= np.exp(-((z - 1400) ** 2) / (2 * 150**2)) * np.exp(-((t - 20) ** 2) / (2 * 4**2))
    return v / np.abs(v).max()


class TestKCSD1D:
    def test_recovers_template(self):
        z = np.linspace(0, 2000, 201)
        t = np.linspace(0, 40, 20)
        x = np.linspace(0, 2000, 24).reshape(-1, 1)
        csd = _template(z, t)
        lfp = np.asarray(fwd_model_1d(csd, z, x.ravel(), 150.0))
        lfp = lfp / np.abs(lfp).max()
        k = KCSD1D(x, lfp, gdx=10.0, h=150.0)
        k.cross_validate(Rs=np.linspace(100, 500, 5), lambdas=np.logspace(-6, -2, 8))
        est = k.values()
        truth = _template(k.estm_x, t)
        r = np.corrcoef((est / np.abs(est).max()).ravel(), truth.ravel())[0, 1]
        assert r > 0.98

    def test_cv_picks_lower_lambda_for_clean_data(self, rng):
        z = np.linspace(0, 2000, 201)
        t = np.linspace(0, 40, 10)
        x = np.linspace(0, 2000, 24).reshape(-1, 1)
        csd = _template(z, t)
        lfp = np.asarray(fwd_model_1d(csd, z, x.ravel(), 150.0))
        lfp = lfp / np.abs(lfp).max()
        noisy = lfp + 0.05 * rng.normal(size=lfp.shape)
        k_clean = KCSD1D(x, lfp, h=150.0)
        k_noisy = KCSD1D(x, noisy, h=150.0)
        Rs = [200.0]
        lams = np.logspace(-8, 0, 12)
        k_clean.cross_validate(Rs, lams)
        k_noisy.cross_validate(Rs, lams)
        assert k_noisy.lambd >= k_clean.lambd

    def test_values_shape(self, rng):
        x = np.linspace(0, 1000, 12).reshape(-1, 1)
        lfp = rng.normal(size=(12, 7))
        k = KCSD1D(x, lfp, gdx=50.0, h=100.0)
        est = k.values()
        assert est.shape == (k.estm_x.size, 7)
