// Oracle driver for golden-trajectory generation.
//
// This file is OUR code (not from the reference). It is compiled OUT-OF-TREE
// against the reference sources at /root/reference (GameSim.cpp + headers)
// to produce golden trajectory fixtures under tests/golden/.  The reference
// code itself is never copied into this repository.
//
// Build (see tools/build_oracle.sh):
//   g++ -O2 -std=c++11 -I/root/reference/include -I<eigen> \
//       tools/oracle_main.cpp /root/reference/src/GameSim.cpp -o /tmp/oracle
//
// Usage:
//   oracle <sched.txt> <out.log> <dt> <T> <winning_score> \
//          <x0[0..3]> <noise> <seed> <tau_puck> <tau_player> \
//          <player_mass> <puck_mass>
//
// Runs the reference sim over the scripted per-player velocity schedule
// (the /root/reference/py/test_collisions.py workload), writing the
// reference's own binary log to <out.log> and the final 22-state vector
// to <out.log>.final.

#include <cstdlib>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include "GameSim.h"

int main(int argc, char** argv) {
  if (argc < 16) {
    std::cerr << "usage: oracle sched log dt T ws x0[4] noise seed "
                 "tau_puck tau_player player_mass puck_mass\n";
    return 1;
  }
  std::string sched_path = argv[1];
  std::string log_path = argv[2];
  double dt = std::atof(argv[3]);
  double T = std::atof(argv[4]);
  int ws = std::atoi(argv[5]);
  Eigen::Vector4d x0(std::atof(argv[6]), std::atof(argv[7]),
                     std::atof(argv[8]), std::atof(argv[9]));
  double noise = std::atof(argv[10]);
  int seed = std::atoi(argv[11]);
  double tau_puck = std::atof(argv[12]);
  double tau_player = std::atof(argv[13]);
  double player_mass = std::atof(argv[14]);
  double puck_mass = std::atof(argv[15]);

  GameSim sim;
  sim.reset(dt, ws, x0, noise, true, log_path, seed, tau_puck, tau_player,
            player_mass, puck_mass);

  std::ifstream f(sched_path.c_str());
  if (!f) {
    std::cerr << "cannot open schedule " << sched_path << "\n";
    return 1;
  }
  int n_steps = static_cast<int>(T / dt + 0.5);
  Eigen::Matrix<double, SimState::SIZE, 1> st;
  std::string line;
  int step = 0;
  while (step < n_steps && std::getline(f, line)) {
    if (line.empty()) continue;
    std::istringstream iss(line);
    double u[8];
    for (int i = 0; i < 8; ++i) iss >> u[i];
    st = sim.run(Eigen::Vector2d(u[0], u[1]), Eigen::Vector2d(u[2], u[3]),
                 Eigen::Vector2d(u[4], u[5]), Eigen::Vector2d(u[6], u[7]));
    ++step;
  }

  std::ofstream ff((log_path + ".final").c_str(), std::ios::binary);
  ff.write(reinterpret_cast<const char*>(st.data()),
           SimState::SIZE * sizeof(double));
  return 0;
}
