from . import fft, lattice, peaks, resample
