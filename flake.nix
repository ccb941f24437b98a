{
  # TPU-native dev environment for livae_tpu.
  #
  # Parity with the reference's env layer (reference: flake.nix — a uv-based
  # default shell plus an `hpc` CUDA shell with nixGL/libcuda plumbing). The
  # TPU rebuild needs no GPU driver shims: jax[tpu] bundles libtpu, and the
  # only native pieces are the in-tree C++ component (native/Makefile, built
  # with the shell's gcc) and whatever libstdc++ manylinux wheels expect.
  #
  # Shells:
  #   nix develop            — uv-managed venv (uv sync against pyproject.toml
  #                            + requirements-lock.txt), CPU-only JAX; runs the
  #                            full test suite (tests force the CPU backend).
  #   nix develop .#tpu      — same plus jax[tpu] env vars for a Cloud TPU VM
  #                            (libtpu via the jax wheel; ICI needs no daemon).
  description = "livae_tpu: TPU-native LI-VAE framework";

  inputs = {
    nixpkgs.url = "github:nixos/nixpkgs/nixos-unstable";
  };

  outputs =
    { nixpkgs, ... }:
    let
      inherit (nixpkgs) lib;
      forAllSystems = lib.genAttrs lib.systems.flakeExposed;
    in
    {
      devShells = forAllSystems (
        system:
        let
          pkgs = import nixpkgs { inherit system; };
          basePackages = [
            pkgs.python313
            pkgs.uv
            pkgs.gcc # native/lattice_native.cpp (make -C native)
            pkgs.gnumake
            pkgs.hdf5 # h5py backend
          ];
          # Manylinux wheels (jaxlib, scipy, h5py) dlopen libstdc++/libz from
          # the system; expose them the same way the reference shell does.
          ldPath = lib.makeLibraryPath [
            pkgs.stdenv.cc.cc.lib
            pkgs.zlib
          ];
          mkShellHook = extra: ''
            export LD_LIBRARY_PATH=${ldPath}:$LD_LIBRARY_PATH
            uv venv --allow-existing .venv
            source .venv/bin/activate
            uv pip sync requirements-lock.txt
            uv pip install -e . --no-deps
            make -C native >/dev/null 2>&1 || true
            ${extra}
          '';
        in
        {
          default = pkgs.mkShell {
            packages = basePackages;
            shellHook = mkShellHook "";
          };
          tpu = pkgs.mkShell {
            packages = basePackages;
            shellHook = mkShellHook ''
              # Cloud TPU VM: jax[tpu] ships libtpu; just make sure the
              # runtime grabs the chips and uses sane defaults.
              uv pip install 'jax[tpu]' >/dev/null
              export JAX_PLATFORMS=tpu,cpu
              export TPU_ML_PLATFORM=livae_tpu
            '';
          };
        }
      );
    };
}
