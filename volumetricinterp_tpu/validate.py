class Validate: pass
