"""NumPy oracle for the log-mel front-end (reference C3 semantics).

Deliberately written the naive way (explicit loops / np.fft) and kept
independent of mla_tpu.ops.frontend so parity tests compare two separate
derivations of the VGGish spec (SURVEY.md §4 "Unit" row).
"""

import numpy as np

MEL_BREAK_FREQUENCY_HERTZ = 700.0
MEL_HIGH_FREQUENCY_Q = 1127.0


def frame(data, window_length, hop_length):
    num_samples = data.shape[0]
    num_frames = 1 + (num_samples - window_length) // hop_length
    shape = (num_frames, window_length) + data.shape[1:]
    strides = (data.strides[0] * hop_length,) + data.strides
    return np.lib.stride_tricks.as_strided(data, shape=shape, strides=strides)


def periodic_hann(window_length):
    return 0.5 - (0.5 * np.cos(2 * np.pi / window_length * np.arange(window_length)))


def stft_magnitude(signal, fft_length, hop_length, window_length):
    frames = frame(signal, window_length, hop_length)
    window = periodic_hann(window_length)
    windowed_frames = frames * window
    return np.abs(np.fft.rfft(windowed_frames, int(fft_length)))


def hertz_to_mel(frequencies_hertz):
    return MEL_HIGH_FREQUENCY_Q * np.log(1.0 + (frequencies_hertz / MEL_BREAK_FREQUENCY_HERTZ))


def spectrogram_to_mel_matrix(
    num_mel_bins=64,
    num_spectrogram_bins=257,
    audio_sample_rate=16000,
    lower_edge_hertz=125.0,
    upper_edge_hertz=7500.0,
):
    nyquist_hertz = audio_sample_rate / 2.0
    spectrogram_bins_hertz = np.linspace(0.0, nyquist_hertz, num_spectrogram_bins)
    spectrogram_bins_mel = hertz_to_mel(spectrogram_bins_hertz)
    band_edges_mel = np.linspace(
        hertz_to_mel(lower_edge_hertz), hertz_to_mel(upper_edge_hertz), num_mel_bins + 2
    )
    mel_weights_matrix = np.empty((num_spectrogram_bins, num_mel_bins))
    for i in range(num_mel_bins):
        lower_edge_mel, center_mel, upper_edge_mel = band_edges_mel[i : i + 3]
        lower_slope = (spectrogram_bins_mel - lower_edge_mel) / (center_mel - lower_edge_mel)
        upper_slope = (upper_edge_mel - spectrogram_bins_mel) / (upper_edge_mel - center_mel)
        mel_weights_matrix[:, i] = np.maximum(0.0, np.minimum(lower_slope, upper_slope))
    mel_weights_matrix[0, :] = 0.0
    return mel_weights_matrix


def log_mel_spectrogram(
    data,
    audio_sample_rate=16000,
    log_offset=0.01,
    window_length_secs=0.025,
    hop_length_secs=0.010,
    **kwargs,
):
    window_length_samples = int(round(audio_sample_rate * window_length_secs))
    hop_length_samples = int(round(audio_sample_rate * hop_length_secs))
    fft_length = 2 ** int(np.ceil(np.log(window_length_samples) / np.log(2.0)))
    spectrogram = stft_magnitude(
        data,
        fft_length=fft_length,
        hop_length=hop_length_samples,
        window_length=window_length_samples,
    )
    mel_spectrogram = np.dot(
        spectrogram,
        spectrogram_to_mel_matrix(
            num_spectrogram_bins=spectrogram.shape[1],
            audio_sample_rate=audio_sample_rate,
            **kwargs,
        ),
    )
    return np.log(mel_spectrogram + log_offset)


def waveform_to_examples(
    data,
    sample_rate=16000,
    example_window_seconds=0.96,
    example_hop_seconds=0.96,
    num_mel_bins=64,
    lower_edge_hertz=125.0,
    upper_edge_hertz=7500.0,
    log_offset=0.01,
    window_length_secs=0.025,
    hop_length_secs=0.010,
):
    """Waveform (already 16 kHz mono float) -> [num_examples, 96, 64]."""
    log_mel = log_mel_spectrogram(
        data,
        audio_sample_rate=sample_rate,
        log_offset=log_offset,
        window_length_secs=window_length_secs,
        hop_length_secs=hop_length_secs,
        num_mel_bins=num_mel_bins,
        lower_edge_hertz=lower_edge_hertz,
        upper_edge_hertz=upper_edge_hertz,
    )
    features_sample_rate = 1.0 / hop_length_secs
    example_window_length = int(round(example_window_seconds * features_sample_rate))
    example_hop_length = int(round(example_hop_seconds * features_sample_rate))
    return frame(log_mel, window_length=example_window_length, hop_length=example_hop_length)
