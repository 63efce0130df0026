class Estimate: pass
