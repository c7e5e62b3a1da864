// Hidden Markov model simulator (16 steps, 3 states) — counterpart of
// pyprob_cpp's test_hmm (reference model: tests/test_inference.py:413-574).

#include <string>
#include <vector>

#include "../ppx/ppx.h"

int main(int argc, char** argv) {
  const char* address = argc > 1 ? argv[1] : "tcp://*:5555";
  ppx::Model model("HMM C++");
  model.serve(address, [](ppx::Model& m) {
    const std::vector<std::vector<double>> T = {
        {0.1, 0.5, 0.4}, {0.2, 0.2, 0.6}, {0.15, 0.15, 0.7}};
    const std::vector<double> means = {-1.0, 1.0, 0.0};
    const std::vector<double> init = {1.0 / 3, 1.0 / 3, 1.0 / 3};
    int state = static_cast<int>(
        m.sample(ppx::categorical(init), "init_state").scalar());
    std::vector<double> states;
    for (int t = 0; t < 16; t++) {
      state = static_cast<int>(
          m.sample(ppx::categorical(T[state]), "state_" + std::to_string(t))
              .scalar());
      m.observe(ppx::normal(means[state], 0.1), "obs_" + std::to_string(t),
                "obs" + std::to_string(t));
      states.push_back(static_cast<double>(state));
    }
    return ppx::Tensor(states);
  });
  return 0;
}
