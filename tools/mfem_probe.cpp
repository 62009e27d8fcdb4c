// Validation probe: prints mesh stats from the reference library so our
// readers can be checked against MFEM's own parsing (volumes, Jacobians).
// Build: see tools/README (links against an external libmfem.a).
#include "mfem.hpp"
#include <cstdio>
using namespace mfem;
int main(int argc, char **argv)
{
   if (argc < 2) { printf("usage: mfem_probe mesh [order]\n"); return 1; }
   Mesh mesh(argv[1], 1, 1);
   double vol = 0.0, mindet = 1e300;
   for (int e = 0; e < mesh.GetNE(); e++)
   {
      ElementTransformation *T = mesh.GetElementTransformation(e);
      const IntegrationRule &ir = IntRules.Get(mesh.GetElementGeometry(e), 12);
      for (int q = 0; q < ir.GetNPoints(); q++)
      {
         T->SetIntPoint(&ir.IntPoint(q));
         double d = T->Weight();
         vol += ir.IntPoint(q).weight * d;
         if (d < mindet) mindet = d;
      }
   }
   printf("{\"ne\": %d, \"nbe\": %d, \"nv\": %d, \"vol\": %.12g, "
          "\"mindet\": %.6g, \"order\": %d}\n",
          mesh.GetNE(), mesh.GetNBE(), mesh.GetNV(), vol, mindet,
          mesh.GetNodes() ? mesh.GetNodes()->FESpace()->GetMaxElementOrder()
                          : 1);
   return 0;
}
