class Interpolate: pass
