"""Star alignment: translation/rotation-invariant triangle matching with a
closed-form affine least-squares refinement."""
