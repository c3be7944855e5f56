"""Parameter-table tests — ports of the reference's physics invariants.

Tolerance bands and expected values mirror the reference test suite
(crates/openwurli-dsp/src/tables.rs tests) so parity regressions are caught.
"""

import jax.numpy as jnp
import numpy as np

from openwurli_tpu import tables
from openwurli_tpu.tables import (
    MIDI_HI,
    MIDI_LO,
    NUM_MODES,
    eigenvalues,
    fundamental_decay_rate,
    intermod_risk,
    midi_to_freq,
    mode_ratios,
    mode_shape,
    perceptual_beat_weight,
    pickup_displacement_scale,
    reed_blank_dims,
    reed_compliance,
    reed_length_mm,
    spatial_coupling_coefficients,
    tip_mass_ratio,
)


def test_midi_to_freq():
    assert abs(float(midi_to_freq(69)) - 440.0) < 0.01
    assert abs(float(midi_to_freq(60)) - 261.63) < 0.1
    assert abs(float(midi_to_freq(33)) - 55.0) < 0.1


def test_midi_to_freq_batched():
    f = midi_to_freq(jnp.array([33, 60, 69]))
    np.testing.assert_allclose(np.asarray(f), [55.0, 261.63, 440.0], atol=0.1)


def test_mode_ratios_bare_beam():
    r = np.asarray(mode_ratios(0.0))
    assert abs(r[0] - 1.0) < 1e-6
    assert abs(r[1] - 6.267) < 0.01
    assert abs(r[2] - 17.547) < 0.02


def test_mode_ratios_with_tip_mass():
    r = np.asarray(mode_ratios(0.10))
    assert abs(r[1] - 7.13) < 0.05


def test_tip_mass_ratio_range():
    assert float(tip_mass_ratio(33)) > 0.05
    assert float(tip_mass_ratio(57)) < 0.02


def test_decay_rate_increases_with_pitch():
    assert float(fundamental_decay_rate(60)) > float(fundamental_decay_rate(48))
    assert float(fundamental_decay_rate(84)) > float(fundamental_decay_rate(72))


def test_decay_rate_obm_calibration():
    bass = float(fundamental_decay_rate(36))
    assert abs(bass - 3.0) < 0.5, f"C2 should be near floor, got {bass}"
    c4 = float(fundamental_decay_rate(60))
    c5 = float(fundamental_decay_rate(72))
    c6 = float(fundamental_decay_rate(84))
    assert 3.5 < c4 < 7.0
    assert 7.0 < c5 < 16.0
    assert 17.0 < c6 < 35.0


def test_eigenvalues_matches_mode_ratios():
    for mu in [0.0, 0.01, 0.05, 0.10, 0.15, 0.20, 0.30, 0.50]:
        betas = np.asarray(eigenvalues(mu))
        ratios = np.asarray(mode_ratios(mu))
        np.testing.assert_allclose(betas**2 / betas[0] ** 2, ratios, atol=1e-10)


def test_reed_length_known_values():
    assert abs(float(reed_length_mm(33)) - 74.93) < 0.1
    assert abs(float(reed_length_mm(96)) - 25.4) < 0.1
    assert abs(float(reed_length_mm(52)) - 50.8) < 0.1


def test_mode_shape_tip_nonzero():
    for mu in [0.0, 0.05, 0.10, 0.20, 0.50]:
        betas = np.asarray(eigenvalues(mu))
        for beta in betas:
            assert abs(float(mode_shape(beta, 1.0))) > 0.1


def test_mode_shape_clamp_zero():
    for mu in [0.0, 0.10, 0.50]:
        betas = np.asarray(eigenvalues(mu))
        for beta in betas:
            assert abs(float(mode_shape(beta, 0.0))) < 1e-10


def test_coupling_mode1_is_unity():
    for midi in range(MIDI_LO, MIDI_HI + 1, 4):
        kappa = np.asarray(
            spatial_coupling_coefficients(tip_mass_ratio(midi), reed_length_mm(midi))
        )
        assert abs(kappa[0] - 1.0) < 1e-10


def test_coupling_decreases_with_mode():
    for midi in range(MIDI_LO, MIDI_HI + 1, 4):
        kappa = np.asarray(
            spatial_coupling_coefficients(tip_mass_ratio(midi), reed_length_mm(midi))
        )
        for i in range(1, NUM_MODES):
            assert kappa[i] <= kappa[0] + 1e-6
        assert kappa[1] < kappa[0]


def test_coupling_register_variation():
    kappa_bass = np.asarray(
        spatial_coupling_coefficients(tip_mass_ratio(33), reed_length_mm(33))
    )
    kappa_treb = np.asarray(
        spatial_coupling_coefficients(tip_mass_ratio(96), reed_length_mm(96))
    )
    for i in range(2, NUM_MODES):
        assert kappa_treb[i] < kappa_bass[i]


def test_blank_dims_known_values():
    w, t = reed_blank_dims(33)
    assert abs(float(w) - 0.151 * 25.4) < 0.01
    assert abs(float(t) - 0.026 * 25.4) < 0.01
    w, t = reed_blank_dims(74)
    assert abs(float(w) - 0.121 * 25.4) < 0.01
    assert abs(float(t) - 0.034 * 25.4) < 0.01
    w, t = reed_blank_dims(96)
    assert abs(float(w) - 0.098 * 25.4) < 0.01
    assert abs(float(t) - 0.034 * 25.4) < 0.01


def test_blank_dims_smooth_transition():
    _, t48 = reed_blank_dims(48)
    _, t53 = reed_blank_dims(53)
    _, t58 = reed_blank_dims(58)
    assert abs(float(t48) - 0.026 * 25.4) < 0.01
    assert abs(float(t58) - 0.034 * 25.4) < 0.01
    assert float(t48) + 0.02 < float(t53) < float(t58) - 0.02


def test_compliance_bass_greater_than_treble():
    c_bass = float(reed_compliance(33))
    c_mid = float(reed_compliance(60))
    c_treb = float(reed_compliance(96))
    assert c_bass > c_mid * 5.0
    assert c_mid > c_treb * 2.0


def test_displacement_scale_monotone_decreasing():
    ds33 = float(pickup_displacement_scale(33))
    ds60 = float(pickup_displacement_scale(60))
    ds96 = float(pickup_displacement_scale(96))
    assert ds33 >= ds60
    assert ds60 > ds96


def test_displacement_scale_c4_calibration():
    assert abs(float(pickup_displacement_scale(60)) - tables.DS_AT_C4) < 0.001


def test_displacement_scale_range():
    ds_bass = float(pickup_displacement_scale(33))
    ds_treb = float(pickup_displacement_scale(96))
    assert ds_bass > 0.50
    assert ds_treb < 0.35
    assert ds_bass / ds_treb > 2.5


def test_perceptual_beat_weight_shape():
    assert float(perceptual_beat_weight(0.3)) < 0.01
    assert float(perceptual_beat_weight(7.0)) > 0.9
    assert float(perceptual_beat_weight(50.0)) < 0.2


def test_intermod_risk_below_threshold():
    midis = jnp.arange(MIDI_LO, MIDI_HI + 1)
    report = intermod_risk(midis)
    max_risks = np.asarray(report["max_risk"])
    worst = max_risks.max()
    threshold = worst * 1.25
    assert threshold < 0.15, f"worst-case risk {worst} too high"
    assert (max_risks < threshold).all()


def test_intermod_risk_known_values():
    report = intermod_risk(33)
    ratio = float(report["mode_ratio"][0])
    assert abs(ratio - 7.13) < 0.1
    assert int(report["nearest_integer"][0]) == 7
    beat = float(report["beat_hz"][0])
    assert 3.0 < beat < 12.0
    assert float(report["perceptual_weight"][0]) > 0.8


def test_output_scale_batched_grid():
    # Full 64-key x 8-velocity calibration grid in one call.
    midis = jnp.arange(MIDI_LO, MIDI_HI + 1, dtype=jnp.float64)
    vels = jnp.linspace(0.1, 1.0, 8)
    grid = tables.output_scale(midis[:, None], vels[None, :])
    assert grid.shape == (64, 8)
    g = np.asarray(grid)
    assert np.isfinite(g).all()
    assert (g > 0).all()
    # Louder velocities never decrease the scaled-output proxy dramatically;
    # sanity: all scales within a plausible range.
    assert g.max() < 10.0 and g.min() > 1e-6


def test_note_params_batched():
    midis = jnp.arange(MIDI_LO, MIDI_HI + 1)
    p = tables.note_params(midis)
    assert p["mode_ratios"].shape == (64, NUM_MODES)
    assert p["mode_amplitudes"].shape == (64, NUM_MODES)
    assert p["mode_decay_rates"].shape == (64, NUM_MODES)
    assert np.isfinite(np.asarray(p["mode_decay_rates"])).all()
