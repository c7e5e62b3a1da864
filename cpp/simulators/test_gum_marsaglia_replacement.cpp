// GUM via the Marsaglia rejection sampler (variable-length traces) —
// counterpart of pyprob_cpp's test_gum_marsaglia_replacement.

#include <cmath>

#include "../ppx/ppx.h"

static double marsaglia(ppx::Model& m, double mean, double stddev) {
  while (true) {
    double x = m.sample(ppx::uniform(-1.0, 1.0), "mars_x").scalar();
    double y = m.sample(ppx::uniform(-1.0, 1.0), "mars_y").scalar();
    double s = x * x + y * y;
    if (s < 1.0) {
      return mean + stddev * (x * std::sqrt(-2.0 * std::log(s) / s));
    }
  }
}

int main(int argc, char** argv) {
  const char* address = argc > 1 ? argv[1] : "tcp://*:5555";
  ppx::Model model("GUM (Marsaglia) C++");
  model.serve(address, [](ppx::Model& m) {
    double mu = marsaglia(m, 1.0, std::sqrt(5.0));
    auto likelihood = ppx::normal(mu, std::sqrt(2.0));
    m.observe(likelihood, "obs0_addr", "obs0");
    m.observe(likelihood, "obs1_addr", "obs1");
    m.tag(ppx::Tensor(mu), "mu_tag", "mu");
    return ppx::Tensor(mu);
  });
  return 0;
}
