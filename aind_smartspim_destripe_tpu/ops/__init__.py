"""Numeric kernels: wavelets, FFT-notch, Otsu, the stripe filter, flat-field."""
