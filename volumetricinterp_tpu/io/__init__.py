from .amisr import read_datafile
from .coeffs import load_coeff_file, save_coeff_file
from .synth import write_synthetic_amisr
